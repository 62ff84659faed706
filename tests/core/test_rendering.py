"""Observability surfaces: pretty() registration and render_html
(reference pretty.py:18-23, pytree.py:205-224)."""

import jax

import genjax_tpu as g


@g.gen
def model():
    x = g.normal(0.0, 1.0) @ "x"
    _ = g.flip(0.5) @ "z"
    return x


def test_render_html_on_framework_objects():
    tr = model.simulate(jax.random.key(0), ())
    for obj in (tr, tr.get_choices(), g.C["x"].set(1.0), g.S["x"]):
        html = obj.render_html()
        assert isinstance(html, str) and len(html) > 0


def test_pretty_is_safe_outside_ipython_and_text_renders():
    import treescope

    g.pretty()  # no-op outside IPython (the reference crashes here)
    tr = model.simulate(jax.random.key(0), ())
    text = treescope.render_to_text(tr)
    assert "StaticTrace" in text
