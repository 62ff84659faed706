"""Choice maps and selections: builders, algebra, and vectorized layouts.

Cookbook-parity narrative for
/root/reference/docs/cookbook/active/choice_maps.ipynb — every section of
the notebook has a counterpart below, asserted so CI catches drift
(tests/test_examples.py runs this file).
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import C, S


# ----------------------------------------------------------------------
# choice maps come from traces
# ----------------------------------------------------------------------


@g.gen
def beta_bernoulli():
    p = g.beta(2.0, 2.0) @ "p"
    v = g.flip(p) @ "v"
    return v


def traces_produce_choice_maps():
    tr = beta_bernoulli.simulate(jax.random.key(0), ())
    # two equivalent accessors
    chm = tr.get_choices()
    assert tr.get_sample() is not None
    # read specific subparts
    p = chm["p"]
    assert 0.0 < float(p) < 1.0
    # sub-map access
    sub = chm.get_submap("v")
    assert sub.get_value() is not None


# ----------------------------------------------------------------------
# building observation maps: many equivalent spellings
# ----------------------------------------------------------------------


def builders():
    # entry builder
    c1 = C["x"].set(1.0)
    # hierarchical addresses
    c2 = C["outer", "inner"].set(2.0)
    assert float(c2["outer", "inner"]) == 2.0
    # dict-style (tuple keys are paths)
    c3 = g.ChoiceMap.d({"a": 3.0, ("b", "c"): 4.0})
    assert float(c3["b", "c"]) == 4.0
    # kwargs-style
    c4 = g.ChoiceMap.kw(u=5.0, v=6.0)
    assert float(c4["u"]) == 5.0
    # directly set a value node / the empty map
    v = g.ChoiceMap.choice(7.0)
    assert float(v.get_value()) == 7.0
    assert g.ChoiceMap.empty().static_is_empty()

    # iteratively accumulating choices (left-priority merge)
    acc = g.ChoiceMap.empty()
    for i, name in enumerate(["a", "b", "c"]):
        acc |= C[name].set(float(i))
    assert float(acc["c"]) == 2.0
    # later .at entries layer OVER an existing map
    updated = acc.at["a"].set(10.0)
    assert float(updated["a"]) == 10.0
    assert float(updated["b"]) == 1.0

    # merge is left-priority
    merged = C["x"].set(10.0) | c1
    assert float(merged["x"]) == 10.0


# ----------------------------------------------------------------------
# vectorized (Indexed) choice maps — the layout of scan/vmap traces
# ----------------------------------------------------------------------


@g.gen
def kernel(c, x):
    z = g.normal(c, 1.0) @ "z"
    y = g.normal(z, 0.5) @ "y"
    return (z, y)


def indexed_maps():
    # numpy-style creation: a dense map over all indices
    dense = C[:, "z"].set(jnp.arange(5.0))
    assert float(dense[2, "z"]) == 2.0
    # full-slice read returns the whole dense inner
    assert jnp.allclose(dense[:, "z"], jnp.arange(5.0))

    # sparse indexed creation: values at a subset of indices; reads at
    # other indices come back as invalid Masks (fixed-shape sum type)
    sparse = C[jnp.asarray([1, 3]), "z"].set(jnp.asarray([10.0, 30.0]))
    hit = sparse.get_submap(jnp.asarray(3), "z").get_value()
    assert isinstance(hit, g.Mask) and bool(hit.primal_flag())
    assert float(hit.value) == 30.0
    miss = sparse.get_submap(jnp.asarray(0), "z").get_value()
    assert isinstance(miss, g.Mask) and not bool(miss.primal_flag())

    # more than one variable per index
    multi = C[jnp.asarray([0, 2])].set(
        g.ChoiceMap.d({"z": jnp.asarray([0.1, 0.2]), "y": jnp.asarray([1.0, 2.0])})
    )
    v = multi.get_submap(jnp.asarray(2), "y").get_value()
    assert float(v.unmask()) == 2.0

    # scan traces use the dense layout: constrain every step's "y"
    sc = kernel.scan(n=5)
    ys = jnp.linspace(-1, 1, 5)
    tr, w = sc.generate(jax.random.key(1), C[:, "y"].set(ys), (0.0, None))
    got = tr.get_choices()[:, "y"]
    got = got.unmask() if isinstance(got, g.Mask) else got
    assert jnp.allclose(got, ys)


# ----------------------------------------------------------------------
# nested vmap: the address hierarchy carries one index level per vmap
# ----------------------------------------------------------------------


def nested_vmap_maps():
    @g.gen
    def point(i, j):
        return g.normal(0.0, 1.0) @ "x"

    inner = point.vmap(in_axes=(None, 0))
    outer = inner.vmap(in_axes=(0, None))
    args = (jnp.arange(2), jnp.arange(3))
    tr = outer.simulate(jax.random.key(2), args)
    chm = tr.get_choices()
    # two integer levels before the leaf address
    v = chm[1, 2, "x"]
    v = v.unmask() if isinstance(v, g.Mask) else v
    assert jnp.ndim(v) == 0
    # constraints address the same hierarchy
    con = C[1, 2, "x"].set(0.5)
    tr2, _ = outer.generate(jax.random.key(3), con, args)
    got = tr2.get_choices()[1, 2, "x"]
    got = got.unmask() if isinstance(got, g.Mask) else got
    assert float(got) == 0.5

    # batched traces via jax.vmap over simulate: slice one lane out to get
    # a valid single trace
    batched = jax.vmap(lambda k: beta_bernoulli.simulate(k, ()))(
        jax.random.split(jax.random.key(4), 8)
    )
    lane0 = jax.tree_util.tree_map(lambda l: l[0], batched)
    assert jnp.isfinite(lane0.get_score())


# ----------------------------------------------------------------------
# filtering and the selection algebra
# ----------------------------------------------------------------------


def selections():
    chm = g.ChoiceMap.d({"x": 1.0, "y": 2.0})
    only_x = chm.filter(S["x"])
    assert float(only_x.get_submap("x").get_value()) == 1.0
    y_val = only_x.get_submap("y").get_value()
    assert y_val is None or not bool(y_val.primal_flag())

    # algebra: union, intersection via filter, complement, wildcard
    sel = S["x"] | S["y", "inner"]
    assert sel("x").check()
    assert sel("y")("inner").check()
    assert not sel("z").check()
    comp = ~S["x"]
    assert not comp("x").check()
    assert comp("y").check()
    wild = S[..., "z"]
    assert wild(3)("z").check()

    # a choice map is itself a selection of its own addresses
    from_chm = chm.get_selection()
    assert from_chm["x"] and not from_chm["nope"]

    # masks: fixed-shape sum types
    m = g.Mask(jnp.asarray(3.0), jnp.asarray(True))
    assert float(m.unmask()) == 3.0
    assert not bool((~m).primal_flag())


def main():
    traces_produce_choice_maps()
    builders()
    indexed_maps()
    nested_vmap_maps()
    selections()
    print("choice-map cookbook: all sections OK")


if __name__ == "__main__":
    main()
