"""Generic GFI-contract harness: one set of invariants, every combinator
composition.

The reference checks these per-combinator in seven hand-written suites
(test_scan/vmap/switch/mask/dimap/mix/repeat, ~2.1k LoC); here the
contract is a single checker applied across a model zoo of nested
compositions, so any new combinator (or edit-path change, like the
round-2 staged incremental evaluator) is automatically held to:

  1. score(simulate) == assess(get_choices)                [density spec]
  2. generate(full choices) == (same trace, weight == score)
  3. generate(empty) has weight 0
  4. project(all) == score, project(none) == 0
  5. Update round trip: forward weight + backward weight == 0 and the
     original trace's score is restored                    [SMCP3]
  6. new_score == old_score + update_weight                [update spec]
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g

KEY = jax.random.key(314159)


@g.gen
def leaf(mu):
    x = g.normal(mu, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return x + y


@g.gen
def kern(c, _x):
    z = g.normal(0.7 * c, 1.0) @ "z"
    return (z, z)


@g.gen
def b0():
    return g.normal(0.0, 1.0) @ "a"


@g.gen
def b1():
    return g.normal(1.0, 2.0) @ "b"


def model_zoo():
    sv = kern.scan(n=4)
    return [
        ("static", leaf, (0.3,)),
        ("nested-static", _nested(), (0.3,)),
        ("vmap", leaf.vmap(in_axes=(0,)), (jnp.arange(3.0),)),
        ("scan", sv, (0.0, jnp.zeros(4))),
        ("vmap-of-scan", sv.vmap(in_axes=(0, None)), (jnp.arange(2.0), jnp.zeros(4))),
        ("switch", g.switch(b0, b1), (0, (), ())),
        ("switch-traced-in-static", _switch_in_static(), (jnp.asarray(1),)),
        ("mask-on", g.mask_combinator(leaf), (True, 0.3)),
        ("dimap", leaf.dimap(pre=lambda a: (a * 2.0,), post=lambda args, r: r + 1.0), (0.15,)),
        ("repeat", leaf.repeat(n=3), (0.3,)),
        ("or_else", b0.or_else(b1), (True, (), ())),
        ("mix", g.mix(b0, b1), (jnp.zeros(2), (), ())),
        ("iterate", _iter_model(), (0.5,)),
        ("iterate_final", _iter_final_model(), (0.5,)),
        ("accumulate", _accumulate_model(), (0.0, jnp.ones(3))),
        ("reduce", _reduce_model(), (0.0, jnp.ones(3))),
        (
            "masked_iterate_final",
            _masked_iter_model(),
            (0.5, jnp.asarray([True, False, True])),
        ),
        ("lgssm-in-static", _lgssm_model(), ()),
        ("gp-regression", _gp_model(), ()),
    ]


def _nested():
    @g.gen
    def nested(mu):
        a = leaf(mu) @ "sub"
        b = g.normal(a, 1.0) @ "top"
        return b

    return nested


def _switch_in_static():
    @g.gen
    def m(idx):
        v = g.switch(b0, b1)(idx, (), ()) @ "sw"
        return v

    return m


def _iter_model():
    @g.gen
    def step(x):
        return g.normal(0.5 * x, 1.0) @ "w"

    return step.iterate(n=3)


def _iter_final_model():
    @g.gen
    def step(x):
        return g.normal(0.5 * x, 1.0) @ "w"

    return step.iterate_final(n=3)


def _accumulate_model():
    @g.gen
    def step(c, x):
        return g.normal(c + x, 1.0) @ "w"

    return step.accumulate()


def _reduce_model():
    @g.gen
    def step(c, x):
        return g.normal(c + x, 1.0) @ "w"

    return step.reduce()


def _masked_iter_model():
    @g.gen
    def step(x):
        return g.normal(0.5 * x, 1.0) @ "w"

    return step.masked_iterate_final()


def _lgssm_model():
    from genjax_tpu.dists import LGSSMParams, LinearGaussianSSM

    params = LGSSMParams.scalar(0.8, 0.5, 1.0, 0.3, 0.0, p0=0.5)
    ys = jnp.asarray([0.2, -0.4, 0.7]).reshape(-1, 1)

    @g.gen
    def m():
        zs = LinearGaussianSSM(params, ys) @ "zs"
        obs = g.normal(jnp.sum(zs), 2.0) @ "obs"
        return obs

    return m


def _gp_model():
    import numpy as np

    from genjax_tpu.models import gp_regression

    X = np.asarray([[0.0], [0.7], [1.5]], np.float32)
    return gp_regression(X)


IDS = [name for name, _, _ in model_zoo()]


@pytest.mark.parametrize("spec", model_zoo(), ids=IDS)
class TestGFIContract:
    def test_simulate_assess_consistency(self, spec):
        _, model, args = spec
        tr = model.simulate(KEY, args)
        score, retval = model.assess(tr.get_choices(), args)
        assert jnp.allclose(tr.get_score(), score, atol=1e-4), spec[0]
        # retval agreement
        for a, b in zip(
            jax.tree_util.tree_leaves(tr.get_retval()),
            jax.tree_util.tree_leaves(retval),
        ):
            assert jnp.allclose(a, b, atol=1e-5), spec[0]

    def test_generate_full_constraint_recovers_score(self, spec):
        _, model, args = spec
        tr = model.simulate(KEY, args)
        new_tr, w = model.generate(
            jax.random.key(7), tr.get_choices(), args
        )
        assert jnp.allclose(w, tr.get_score(), atol=1e-4), spec[0]
        assert jnp.allclose(new_tr.get_score(), tr.get_score(), atol=1e-4)

    def test_generate_empty_weight_zero(self, spec):
        _, model, args = spec
        _tr, w = model.generate(KEY, g.ChoiceMap.empty(), args)
        assert jnp.allclose(w, 0.0, atol=1e-6), spec[0]

    def test_project_all_none(self, spec):
        _, model, args = spec
        tr = model.simulate(KEY, args)
        assert jnp.allclose(
            tr.project(jax.random.key(1), g.Selection.all()),
            tr.get_score(),
            atol=1e-4,
        ), spec[0]
        assert jnp.allclose(
            tr.project(jax.random.key(1), g.Selection.none()), 0.0, atol=1e-6
        ), spec[0]

    def test_update_roundtrip_and_score_identity(self, spec):
        name, model, args = spec
        tr = model.simulate(KEY, args)
        # constrain every choice to a fresh simulation's values: a full
        # substitution update with a known target score
        donor = model.simulate(jax.random.key(3), args)
        constraint = donor.get_choices()
        new_tr, w, _rd, bwd = model.edit(
            jax.random.key(5),
            tr,
            g.Update(constraint),
            g.Diff.tree_diff_no_change(args),
        )
        assert jnp.allclose(
            new_tr.get_score(), tr.get_score() + w, atol=1e-3
        ), name
        assert jnp.allclose(
            new_tr.get_score(), donor.get_score(), atol=1e-3
        ), name
        back, wb, _, _ = new_tr.edit(jax.random.key(6), bwd)
        assert jnp.allclose(w + wb, 0.0, atol=1e-3), name
        assert jnp.allclose(
            back.get_score(), tr.get_score(), atol=1e-3
        ), name
