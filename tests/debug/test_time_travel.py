"""Time-travel debugger tests.

Modeled on the reference's debugging cookbook usage
(/root/reference/docs/cookbook/active/debugging.ipynb) and
time_travel.py's fwd/bwd/jump/remix API.
"""

import jax
import jax.numpy as jnp
import pytest

from genjax_tpu.debug import rec, tag, time_machine


def program(x):
    y = rec(lambda a: a * 2.0, "double")(x)
    z = rec(lambda a: a + 10.0, "add10")(y)
    return tag(z * z, "squared")


class TestTimeMachine:
    def test_final_retval(self):
        dbg = time_machine(program)(3.0)
        assert dbg.final_retval == pytest.approx(256.0)

    def test_all_frames_captured(self):
        dbg = time_machine(program)(3.0)
        tags = [f.debug_tag for f in dbg.sequence]
        assert tags == ["_enter", "double", "add10", "squared", "_exit"]

    def test_jump_and_frame(self):
        dbg = time_machine(program)(3.0)
        at = dbg.jump("add10")
        tag_, frame = at.frame()
        assert tag_ == "add10"
        assert frame.args[0] == pytest.approx(6.0)
        assert frame.local_retval == pytest.approx(16.0)

    def test_fwd_bwd(self):
        dbg = time_machine(program)(3.0).jump("add10")
        assert dbg.fwd().frame()[0] == "squared"
        assert dbg.bwd().frame()[0] == "double"
        # saturating at the ends
        first = dbg.jump("_enter")
        assert first.bwd().frame()[0] == "_enter"

    def test_remix_reexecutes_from_frame(self):
        dbg = time_machine(program)(3.0).jump("add10")
        remixed = dbg.remix(100.0)
        assert remixed.final_retval == pytest.approx((100.0 + 10.0) ** 2)
        # frames before the remix point are preserved
        assert remixed.sequence[1].debug_tag == "double"

    def test_with_array_computation(self):
        def prog(x):
            s = tag(jnp.sum(x**2), "ss")
            return s + tag(jnp.mean(x), "mean")

        dbg = time_machine(prog)(jnp.arange(4.0))
        assert dbg.final_retval == pytest.approx(14.0 + 1.5)
        assert [f.debug_tag for f in dbg.sequence] == [
            "_enter",
            "ss",
            "mean",
            "_exit",
        ]

    def test_model_debugging(self):
        """Record points inside a @gen model body's deterministic code."""
        import genjax_tpu as g

        @g.gen
        def model(mu):
            x = g.normal(mu, 1.0) @ "x"
            shifted = tag(x + 100.0, "shifted")
            y = g.normal(shifted, 0.5) @ "y"
            return y

        dbg = time_machine(lambda mu: model.simulate(jax.random.key(0), (mu,)).get_retval())(0.0)
        assert "shifted" in [f.debug_tag for f in dbg.sequence]
