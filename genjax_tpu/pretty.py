"""Rich rendering: register treescope as the default pretty-printer with
array autovisualization.

Parity: reference ``/root/reference/src/genjax/pretty.py`` (``pretty()``
:18-23). Every framework object also supports ``render_html()`` directly
(core/pytree.py).
"""

from __future__ import annotations


def pretty() -> None:
    """Install treescope as the default repr (notebook-oriented) with
    automatic array visualization. Outside an IPython session (where
    treescope's display hooks have nothing to attach to) this is a no-op —
    use ``obj.render_html()`` / ``treescope.render_to_text(obj)``
    directly in plain scripts."""
    import treescope

    try:
        import IPython

        in_ipython = IPython.get_ipython() is not None
    except ImportError:
        in_ipython = False
    if not in_ipython:
        return
    treescope.register_as_default()
    treescope.register_autovisualize_magic()
    treescope.active_autovisualizer.set_interactive(
        treescope.ArrayAutovisualizer()
    )


__all__ = ["pretty"]
