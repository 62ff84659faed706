"""The staged incremental edit's handler fallback: bodies that need
concrete values (Python control flow on arguments) cannot be staged to a
Jaxpr; outside jit they must still edit correctly via the handler path
(lang/static_lang.py _edit_via_handler)."""

import jax
import jax.numpy as jnp
import jax.scipy.stats as st
import pytest

import genjax_tpu as g
from genjax_tpu.lang.staged_edit import StagingUnsupported, stage_body

KEY = jax.random.key(0)


@g.gen
def branchy(flag):
    # Python `if` on the argument: un-stageable, fine eagerly
    if flag > 0:
        x = g.normal(2.0, 1.0) @ "x"
    else:
        x = g.normal(-2.0, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return y


class TestFallback:
    def test_staging_is_refused_for_concrete_control_flow(self):
        with pytest.raises(StagingUnsupported):
            stage_body(branchy.source, (1.0,))

    def test_handler_fallback_edit_correctness(self):
        tr = branchy.simulate(KEY, (1.0,))
        y0 = float(tr.get_choices()["y"])
        new_tr, w, _rd, bwd = tr.edit(
            jax.random.key(1), g.Update(g.C["x"].set(0.5))
        )
        # weight: x re-scored at its new value, y re-scored under new mean
        x0 = float(tr.get_choices()["x"])
        expected = (
            st.norm.logpdf(0.5, 2.0, 1.0)
            - st.norm.logpdf(x0, 2.0, 1.0)
            + st.norm.logpdf(y0, 0.5, 0.5)
            - st.norm.logpdf(y0, x0, 0.5)
        )
        assert float(w) == pytest.approx(float(expected), abs=1e-5)
        # SMCP3 round trip through the fallback
        back, wb, _, _ = new_tr.edit(jax.random.key(2), bwd)
        assert float(w + wb) == pytest.approx(0.0, abs=1e-5)
        assert float(back.get_score()) == pytest.approx(
            float(tr.get_score()), abs=1e-5
        )

    def test_fallback_regenerate(self):
        tr = branchy.simulate(KEY, (-1.0,))
        new_tr, w, _, _ = tr.edit(
            jax.random.key(3), g.Regenerate(g.S["x"])
        )
        assert float(new_tr.get_choices()["x"]) != float(
            tr.get_choices()["x"]
        )
        score, _ = branchy.assess(new_tr.get_choices(), (-1.0,))
        assert float(new_tr.get_score()) == pytest.approx(
            float(score), abs=1e-5
        )

    def test_stageable_body_uses_staged_path(self):
        # sanity: a normal body stages fine (no exception)
        @g.gen
        def clean(mu):
            return g.normal(mu, 1.0) @ "x"

        closed, flat, out_tree = stage_body(clean.source, (0.0,))
        assert any(
            str(e.primitive) == "addr_call" for e in closed.jaxpr.eqns
        )
