"""Rich rendering: register treescope as the default pretty-printer with
array autovisualization.

Parity: reference ``/root/reference/src/genjax/pretty.py`` (``pretty()``
:18-23). Every framework object also supports ``render_html()`` directly
(core/pytree.py).
"""

from __future__ import annotations


def pretty() -> None:
    """Install treescope as the default repr (notebook-oriented) with
    automatic array visualization."""
    import treescope

    treescope.register_as_default()
    treescope.register_autovisualize_magic()
    treescope.active_autovisualizer.set_interactive(
        treescope.ArrayAutovisualizer()
    )


__all__ = ["pretty"]
