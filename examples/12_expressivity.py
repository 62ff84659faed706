"""Expressivity patterns: conditionals, masking, mixtures, iteration.

Counterparts of the reference's expressivity cookbook
(docs/cookbook/inactive/expressivity/{conditionals,masking,mixture,
iterating_computation}.ipynb): how fixed-shape accelerator programs
express models whose *structure* is random.
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as st

import genjax_tpu as g

KEY = jax.random.key(7)


def conditionals():
    """Stochastic branching: or_else / switch select entire sub-programs
    by a (possibly traced) condition — both branches stay fixed-shape."""

    @g.gen
    def spike():
        return g.normal(0.0, 0.1) @ "v"

    @g.gen
    def slab():
        return g.normal(0.0, 10.0) @ "v"

    @g.gen
    def spike_and_slab(p_spike):
        use_spike = g.flip(p_spike) @ "is_spike"
        v = spike.or_else(slab)(use_spike, (), ()) @ "value"
        return v

    tr = spike_and_slab.simulate(KEY, (0.9,))
    assert jnp.isfinite(tr.get_score())
    # density accounting follows the taken branch
    chm = tr.get_choices()
    is_spike = chm["is_spike"]
    v = chm["value", "v"]
    v = v.unmask() if isinstance(v, g.Mask) else v
    branch_scale = jnp.where(is_spike, 0.1, 10.0)
    expected = st.bernoulli.logpmf(is_spike, 0.9) + st.norm.logpdf(
        v, 0.0, branch_scale
    )
    assert jnp.allclose(tr.get_score(), expected, atol=1e-5)


def masking():
    """Existence uncertainty as data: the mask combinator keeps a
    sub-program's shape while zeroing its density when inactive."""

    @g.gen
    def maybe_outlier(x):
        return g.normal(x, 5.0) @ "noise"

    mm = maybe_outlier.mask()
    on = mm.simulate(KEY, (True, 1.0))
    off = mm.simulate(KEY, (False, 1.0))
    assert float(off.get_score()) == 0.0
    assert float(on.get_score()) != 0.0
    # the retval is a Mask: consume it with unmask(default)
    assert isinstance(off.get_retval(), g.Mask)
    assert float(off.get_retval().unmask(default=jnp.asarray(-1.0))) == -1.0


def mixtures():
    """mix() builds a mixture generative function: a categorical component
    choice plus a switch over component families."""

    @g.gen
    def narrow():
        return g.normal(-3.0, 0.5) @ "x"

    @g.gen
    def wide():
        return g.normal(3.0, 2.0) @ "x"

    m = g.mix(narrow, wide)
    logits = jnp.log(jnp.asarray([0.25, 0.75]))
    trs = jax.vmap(lambda k: m.simulate(k, (logits, (), ())))(
        jax.random.split(KEY, 2048)
    )
    comps = trs.get_choices()["mixture_component"]
    assert abs(float(jnp.mean(comps)) - 0.75) < 0.05
    # assess matches the mixture's component-conditional density
    tr0 = m.simulate(jax.random.key(1), (logits, (), ()))
    score, _ = m.assess(tr0.get_choices(), (logits, (), ()))
    assert jnp.allclose(score, tr0.get_score(), atol=1e-5)


def iteration():
    """Dynamic-length iteration inside fixed shapes: masked_iterate runs a
    kernel for a *runtime* number of steps via per-step activity flags."""

    @g.gen
    def halve(x):
        return g.normal(0.5 * x, 0.01) @ "x"

    mi = halve.masked_iterate_final()
    # 3 active steps out of a static budget of 5
    flags = jnp.asarray([True, True, True, False, False])
    tr = mi.simulate(KEY, (8.0, flags))
    assert jnp.allclose(tr.get_retval(), 1.0, atol=0.2)  # 8 / 2^3
    # all 5 budget slots exist in the trace; only 3 carry density
    score, _ = mi.assess(tr.get_choices(), (8.0, flags))
    assert jnp.allclose(score, tr.get_score(), atol=1e-4)


def main():
    conditionals()
    masking()
    mixtures()
    iteration()
    print("expressivity cookbook: all sections OK")


if __name__ == "__main__":
    main()
