"""GFI contract tests for the combinators.

Modeled on the reference's combinator test strategy (SURVEY.md §4, style 2):
simulate scores, assess agreement, importance-weight identities, and edit
weight identities checked against hand-computed log-densities. Reference
tests: /root/reference/tests/generative_functions/{test_scan.py,
test_vmap.py, test_switch.py, test_mask.py, test_dimap.py, test_mix.py,
test_repeat.py, test_or_else.py}.
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as jss
import pytest

import genjax_tpu as g

KEY = jax.random.key(314159)


@g.gen
def two_normals(mu):
    x = g.normal(mu, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return y


def normal_lp(v, mu, sigma):
    return jss.norm.logpdf(v, mu, sigma)


class TestVmap:
    def test_simulate_score_is_sum_of_lanes(self):
        vm = two_normals.vmap(in_axes=(0,))
        mus = jnp.arange(4.0)
        tr = jax.jit(vm.simulate)(KEY, (mus,))
        chm = tr.get_choices()
        expected = 0.0
        for i in range(4):
            x = chm[i, "x"]
            y = chm[i, "y"]
            expected += normal_lp(x, mus[i], 1.0) + normal_lp(y, x, 0.5)
        assert tr.get_score() == pytest.approx(expected, rel=1e-5)

    def test_assess_matches_simulate(self):
        vm = two_normals.vmap(in_axes=(0,))
        mus = jnp.arange(3.0)
        tr = vm.simulate(KEY, (mus,))
        score, _ = vm.assess(tr.get_choices(), (mus,))
        assert score == pytest.approx(tr.get_score(), rel=1e-5)

    def test_generate_weight_identity(self):
        """w = score(trace) - score(unconstrained part under prior)."""
        vm = two_normals.vmap(in_axes=(0,))
        mus = jnp.zeros(3)
        constraint = g.C[1, "x"].set(0.7)
        tr, w = jax.jit(vm.generate)(KEY, constraint, (mus,))
        assert tr.get_choices()[1, "x"] == pytest.approx(0.7)
        # weight is the logpdf of the constrained choice given its parents
        assert w == pytest.approx(normal_lp(0.7, 0.0, 1.0), rel=1e-5)

    def test_update_weight_identity(self):
        vm = two_normals.vmap(in_axes=(0,))
        mus = jnp.zeros(2)
        tr = vm.simulate(KEY, (mus,))
        chm = tr.get_choices()
        old_x0 = chm[0, "x"]
        y0 = chm[0, "y"]
        new_tr, w, _rd, discard = tr.update(KEY, g.C[0, "x"].set(2.0))
        # w = new joint - old joint (y0 unchanged, lane 1 unchanged)
        expected = (
            normal_lp(2.0, 0.0, 1.0)
            + normal_lp(y0, 2.0, 0.5)
            - normal_lp(old_x0, 0.0, 1.0)
            - normal_lp(y0, old_x0, 0.5)
        )
        assert w == pytest.approx(expected, rel=1e-4)
        assert new_tr.get_score() == pytest.approx(tr.get_score() + w, rel=1e-4)
        # discard holds the old value (Mask-wrapped: lane lookup is dynamic)
        d = discard[0, "x"]
        d = d.unmask() if isinstance(d, g.Mask) else d
        assert d == pytest.approx(old_x0)

    def test_index_edit_matches_dense_update(self):
        vm = two_normals.vmap(in_axes=(0,))
        mus = jnp.zeros(8)
        tr = vm.simulate(KEY, (mus,))
        req = g.IndexRequest(jnp.asarray(3), g.Update(g.C["x"].set(1.5)))
        new_tr, w, _rd, bwd = tr.edit(KEY, req)
        dense_tr, dense_w, _, _ = tr.update(KEY, g.C[3, "x"].set(1.5))
        assert w == pytest.approx(dense_w, rel=1e-4)
        assert new_tr.get_score() == pytest.approx(dense_tr.get_score(), rel=1e-4)
        assert new_tr.get_choices()[3, "x"] == pytest.approx(1.5)

    def test_project_all_none(self):
        vm = two_normals.vmap(in_axes=(0,))
        tr = vm.simulate(KEY, (jnp.zeros(3),))
        assert tr.project(KEY, g.Selection.all()) == pytest.approx(
            tr.get_score(), rel=1e-5
        )
        assert tr.project(KEY, g.Selection.none()) == pytest.approx(0.0)

    def test_project_subselection(self):
        vm = two_normals.vmap(in_axes=(0,))
        tr = vm.simulate(KEY, (jnp.zeros(3),))
        chm = tr.get_choices()
        w = tr.project(KEY, g.S[1, "x"])
        assert w == pytest.approx(normal_lp(chm[1, "x"], 0.0, 1.0), rel=1e-5)


@g.gen
def rw_kernel(c, x):
    z = g.normal(c, 1.0) @ "z"
    return (z, z + x)


class TestScan:
    def test_simulate_score(self):
        sc = rw_kernel.scan()
        xs = jnp.ones(5)
        tr = jax.jit(sc.simulate)(KEY, (0.0, xs))
        chm = tr.get_choices()
        zs = [chm[t, "z"] for t in range(5)]
        expected = normal_lp(zs[0], 0.0, 1.0)
        for t in range(1, 5):
            expected += normal_lp(zs[t], zs[t - 1], 1.0)
        assert tr.get_score() == pytest.approx(expected, rel=1e-5)
        # retval: (final carry, ys)
        c_final, ys = tr.get_retval()
        assert c_final == pytest.approx(zs[-1])
        assert ys.shape == (5,)

    def test_assess_matches(self):
        sc = rw_kernel.scan()
        xs = jnp.zeros(4)
        tr = sc.simulate(KEY, (0.0, xs))
        score, (c_final, ys) = sc.assess(tr.get_choices(), (0.0, xs))
        assert score == pytest.approx(tr.get_score(), rel=1e-5)

    def test_generate_partial_constraint(self):
        sc = rw_kernel.scan()
        xs = jnp.zeros(3)
        c = g.C[1, "z"].set(0.3)
        tr, w = jax.jit(sc.generate)(KEY, c, (0.0, xs))
        chm = tr.get_choices()
        assert chm[1, "z"] == pytest.approx(0.3)
        z0 = chm[0, "z"]
        assert w == pytest.approx(normal_lp(0.3, z0, 1.0), rel=1e-5)

    def test_update_weight_and_carry_propagation(self):
        sc = rw_kernel.scan()
        xs = jnp.zeros(3)
        tr = sc.simulate(KEY, (0.0, xs))
        chm = tr.get_choices()
        new_tr, w, _rd, _discard = tr.update(KEY, g.C[0, "z"].set(1.0))
        new_chm = new_tr.get_choices()
        assert new_chm[0, "z"] == pytest.approx(1.0)
        # downstream steps keep their values but are re-scored under z0=1
        assert new_chm[1, "z"] == pytest.approx(chm[1, "z"])
        assert new_tr.get_score() == pytest.approx(tr.get_score() + w, rel=1e-4)

    def test_index_edit_weight(self):
        sc = rw_kernel.scan()
        xs = jnp.zeros(6)
        tr = sc.simulate(KEY, (0.0, xs))
        chm = tr.get_choices()
        # Editing z at t=2 changes the carry into t=3 — but the carry OUT of
        # t=3 is z3 itself (unchanged), so the locality assumption holds.
        req = g.IndexRequest(jnp.asarray(2), g.Update(g.C["z"].set(0.9)))
        new_tr, w, _rd, bwd = tr.edit(KEY, req)
        z1, z2, z3 = chm[1, "z"], chm[2, "z"], chm[3, "z"]
        expected = (
            normal_lp(0.9, z1, 1.0)
            - normal_lp(z2, z1, 1.0)
            + normal_lp(z3, 0.9, 1.0)
            - normal_lp(z3, z2, 1.0)
        )
        assert w == pytest.approx(expected, rel=1e-4)
        assert new_tr.get_score() == pytest.approx(tr.get_score() + w, rel=1e-4)
        assert isinstance(bwd, g.IndexRequest)

    def test_project(self):
        sc = rw_kernel.scan()
        xs = jnp.zeros(4)
        tr = sc.simulate(KEY, (0.0, xs))
        chm = tr.get_choices()
        w = tr.project(KEY, g.S[2, "z"])
        assert w == pytest.approx(
            normal_lp(chm[2, "z"], chm[1, "z"], 1.0), rel=1e-5
        )


@g.gen
def branch_normal():
    return g.normal(0.0, 1.0) @ "n"


@g.gen
def branch_flip():
    f = g.flip(0.3) @ "f"
    return jnp.asarray(f, jnp.float32)


class TestSwitch:
    def test_simulate_concrete_index(self):
        sw = g.switch(branch_normal, branch_flip)
        tr = jax.jit(sw.simulate)(KEY, (0, (), ()))
        chm = tr.get_choices()
        n = chm["n"]
        n = n.unmask() if isinstance(n, g.Mask) else n
        assert tr.get_score() == pytest.approx(
            normal_lp(n, 0.0, 1.0), rel=1e-5
        )

    def test_simulate_traced_index(self):
        sw = g.switch(branch_normal, branch_flip)
        tr = jax.jit(sw.simulate)(KEY, (jnp.asarray(1), (), ()))
        f = tr.get_choices()["f"]
        f = f.value if isinstance(f, g.Mask) else f
        p = jnp.where(f, 0.3, 0.7)
        assert tr.get_score() == pytest.approx(jnp.log(p), rel=1e-5)

    def test_assess(self):
        sw = g.switch(branch_normal, branch_flip)
        tr = sw.simulate(KEY, (jnp.asarray(0), (), ()))
        score, _ = sw.assess(tr.get_choices(), (jnp.asarray(0), (), ()))
        assert score == pytest.approx(tr.get_score(), rel=1e-5)

    def test_generate_constrained(self):
        sw = g.switch(branch_normal, branch_flip)
        tr, w = jax.jit(sw.generate)(KEY, g.C["n"].set(0.5), (0, (), ()))
        assert w == pytest.approx(normal_lp(0.5, 0.0, 1.0), rel=1e-5)

    def test_update_same_index(self):
        sw = g.switch(branch_normal, branch_flip)
        tr = sw.simulate(KEY, (0, (), ()))
        new_tr, w, _rd, _bwd = tr.update(KEY, g.C["n"].set(1.0))
        assert w == pytest.approx(
            normal_lp(1.0, 0.0, 1.0) - tr.get_score(), rel=1e-4
        )
        assert new_tr.get_choices()["n"] == pytest.approx(1.0)


class TestMask:
    def test_false_score_zero(self):
        mm = two_normals.mask()
        tr = mm.simulate(KEY, (False, 0.0))
        assert tr.get_score() == pytest.approx(0.0)
        rv = tr.get_retval()
        assert isinstance(rv, g.Mask)

    def test_true_matches_inner(self):
        mm = two_normals.mask()
        tr = mm.simulate(KEY, (True, 0.0))
        inner = two_normals.simulate(KEY, (0.0,))
        # same key path → same choices
        assert tr.get_score() == pytest.approx(inner.get_score(), rel=1e-5)

    def test_traced_flag(self):
        mm = two_normals.mask()
        tr = jax.jit(mm.simulate)(KEY, (jnp.asarray(True), 0.0))
        assert float(tr.get_score()) != 0.0

    def test_edit_flag_transitions(self):
        """All four flag transitions of the Mask edit (reference
        mask.py:179): the weight is the masked-score delta."""
        mm = two_normals.mask()

        def argdiffs(flag):
            return (
                g.Diff(jnp.asarray(flag), g.UnknownChange),
                g.Diff(0.0, g.NoChange),
            )

        # True -> False: weight = -inner score
        tr = mm.simulate(KEY, (jnp.asarray(True), 0.0))
        inner_score = tr.inner.get_score()
        new_tr, w, _rd, _bwd = mm.edit(
            KEY, tr, g.Update(g.C.empty()), argdiffs(False)
        )
        assert w == pytest.approx(-inner_score, rel=1e-5)
        assert new_tr.get_score() == pytest.approx(0.0)

        # False -> False: no score either side, weight 0
        tr_off = mm.simulate(KEY, (jnp.asarray(False), 0.0))
        new_tr, w, _, _ = mm.edit(
            KEY, tr_off, g.Update(g.C.empty()), argdiffs(False)
        )
        assert float(w) == pytest.approx(0.0, abs=1e-6)
        assert float(new_tr.get_score()) == pytest.approx(0.0)

        # False -> True: the dormant inner trace's score turns on
        new_tr, w, _, _ = mm.edit(
            KEY, tr_off, g.Update(g.C.empty()), argdiffs(True)
        )
        assert float(w) == pytest.approx(
            float(new_tr.get_score()), rel=1e-5
        )
        assert float(new_tr.get_score()) != 0.0

        # True -> True with a constraint: masked substitution, weight =
        # score delta (same identity as the unmasked combinator)
        new_tr, w, _, _ = mm.edit(
            KEY, tr, g.Update(g.C["x"].set(0.7)), argdiffs(True)
        )
        assert float(w) == pytest.approx(
            float(new_tr.get_score() - tr.get_score()), rel=1e-4
        )
        got = new_tr.get_choices()["x"]
        got = got.unmask() if isinstance(got, g.Mask) else got
        assert float(got) == pytest.approx(0.7)

    def test_assess(self):
        mm = two_normals.mask()
        tr = mm.simulate(KEY, (True, 0.0))
        score, rv = mm.assess(tr.inner.get_choices(), (True, 0.0))
        assert score == pytest.approx(tr.get_score(), rel=1e-5)


class TestDimap:
    def test_pre_post(self):
        dm = two_normals.dimap(
            pre=lambda a, b: (a + b,),
            post=lambda args, r: r * 2.0,
        )
        tr = dm.simulate(KEY, (1.0, 2.0))
        inner = two_normals.simulate(KEY, (3.0,))
        assert tr.get_score() == pytest.approx(inner.get_score(), rel=1e-5)
        assert tr.get_retval() == pytest.approx(2.0 * inner.get_retval(), rel=1e-5)

    def test_update_through_dimap(self):
        dm = two_normals.contramap(lambda a: (a * 2.0,))
        tr = dm.simulate(KEY, (0.5,))
        new_tr, w, _rd, _ = tr.update(KEY, g.C["x"].set(0.0))
        assert new_tr.get_choices()["x"] == pytest.approx(0.0)
        assert new_tr.get_score() == pytest.approx(tr.get_score() + w, rel=1e-4)


class TestRepeat:
    def test_iid_score(self):
        rp = two_normals.repeat(n=5)
        tr = jax.jit(rp.simulate)(KEY, (0.0,))
        assert tr.get_retval().shape == (5,)
        chm = tr.get_choices()
        expected = 0.0
        for i in range(5):
            x, y = chm[i, "x"], chm[i, "y"]
            expected += normal_lp(x, 0.0, 1.0) + normal_lp(y, x, 0.5)
        assert tr.get_score() == pytest.approx(expected, rel=1e-5)

    def test_update_one_lane(self):
        rp = two_normals.repeat(n=3)
        tr = rp.simulate(KEY, (0.0,))
        new_tr, w, _rd, _ = tr.update(KEY, g.C[1, "x"].set(0.0))
        assert new_tr.get_choices()[1, "x"] == pytest.approx(0.0)
        assert new_tr.get_score() == pytest.approx(tr.get_score() + w, rel=1e-4)


class TestOrElse:
    def test_branches(self):
        oe = g.or_else(branch_normal, branch_flip)
        tr_if = jax.jit(oe.simulate)(KEY, (jnp.asarray(True), (), ()))
        assert "n" in tr_if.get_choices()
        tr_else = jax.jit(oe.simulate)(KEY, (jnp.asarray(False), (), ()))
        f = tr_else.get_choices()["f"]
        assert f is not None


class TestMix:
    def test_structure_and_score(self):
        mx = g.mix(branch_normal, branch_normal)
        logits = jnp.log(jnp.array([0.25, 0.75]))
        tr = jax.jit(mx.simulate)(KEY, (logits, (), ()))
        chm = tr.get_choices()
        idx = chm["mixture_component"]
        idx = idx.value if isinstance(idx, g.Mask) else idx
        n = chm["component_sample", "n"]
        n = n.value if isinstance(n, g.Mask) else n
        expected = jnp.log(jnp.array([0.25, 0.75]))[idx] + normal_lp(n, 0.0, 1.0)
        assert tr.get_score() == pytest.approx(expected, rel=1e-4)


class TestDerivedScan:
    def test_accumulate(self):
        @g.gen
        def acc_k(c, x):
            return g.normal(c + x, 0.01) @ "a"

        ac = acc_k.accumulate()
        tr = jax.jit(ac.simulate)(KEY, (0.0, jnp.ones(4)))
        out = tr.get_retval()
        assert out.shape == (5,)
        assert out[0] == pytest.approx(0.0)

    def test_reduce(self):
        @g.gen
        def add_k(c, x):
            return g.normal(c + x, 0.01) @ "a"

        rd = add_k.reduce()
        tr = jax.jit(rd.simulate)(KEY, (0.0, jnp.ones(4)))
        assert tr.get_retval() == pytest.approx(4.0, abs=0.2)

    def test_iterate(self):
        @g.gen
        def walk(x):
            return g.normal(x, 1.0) @ "s"

        it = walk.iterate(n=3)
        tr = jax.jit(it.simulate)(KEY, (0.0,))
        assert tr.get_retval().shape == (4,)

    def test_iterate_final(self):
        @g.gen
        def walk(x):
            return g.normal(x, 0.01) @ "s"

        itf = walk.iterate_final(n=10)
        tr = jax.jit(itf.simulate)(KEY, (5.0,))
        assert tr.get_retval() == pytest.approx(5.0, abs=0.5)

    def test_masked_iterate(self):
        @g.gen
        def walk(x):
            return g.normal(x, 1.0) @ "s"

        mi = walk.masked_iterate()
        flags = jnp.array([True, True, False])
        tr = jax.jit(mi.simulate)(KEY, (0.0, flags))
        out = tr.get_retval()
        assert out.shape == (4,)
        # the masked step keeps the previous state
        assert out[3] == pytest.approx(out[2])

    def test_masked_iterate_final_score(self):
        @g.gen
        def walk(x):
            return g.normal(x, 1.0) @ "s"

        mif = walk.masked_iterate_final()
        flags = jnp.array([True, False, False])
        tr = jax.jit(mif.simulate)(KEY, (0.0, flags))
        chm = tr.get_choices()
        s0 = chm[0, "s"]
        s0 = s0.value if isinstance(s0, g.Mask) else s0
        # only step 0 contributes score
        assert tr.get_score() == pytest.approx(normal_lp(s0, 0.0, 1.0), rel=1e-4)


class TestNestedCombinators:
    def test_vmap_of_scan(self):
        sc = rw_kernel.scan()
        vm = sc.vmap(in_axes=(0, 0))
        inits = jnp.zeros(3)
        xs = jnp.zeros((3, 4))
        tr = jax.jit(vm.simulate)(KEY, (inits, xs))
        chm = tr.get_choices()
        z = chm[1, 2, "z"]
        z_prev = chm[1, 1, "z"]
        score, _ = vm.assess(chm, (inits, xs))
        assert score == pytest.approx(tr.get_score(), rel=1e-5)

    def test_scan_of_switch_in_gen(self):
        @g.gen
        def hybrid(c, x):
            b = g.flip(0.5) @ "b"
            idx = jnp.astype(b, jnp.int32)
            v = g.switch(branch_normal, branch_flip)(idx, (), ()) @ "v"
            return (c + v, v)

        sc = hybrid.scan()
        tr = jax.jit(sc.simulate)(KEY, (0.0, jnp.zeros(3)))
        score, _ = sc.assess(tr.get_choices(), (0.0, jnp.zeros(3)))
        assert score == pytest.approx(tr.get_score(), rel=1e-4)


class TestLosslessBackwardRequests:
    """Regression (code-review finding): scan/vmap Regenerate previously
    dropped non-Update backward requests, so the SMCP3 round trip could not
    restore the original trace."""

    def test_scan_regenerate_roundtrip(self):
        sc = rw_kernel.scan()
        xs = jnp.zeros(4)
        tr = sc.simulate(KEY, (0.0, xs))
        nd = g.Diff.tree_diff_no_change(tr.get_args())
        new_tr, w1, _, bwd = sc.edit(KEY, tr, g.Regenerate(g.S[..., "z"]), nd)
        assert isinstance(bwd, g.VectorRequest)
        back_tr, w2, _, _ = new_tr.edit(jax.random.key(9), bwd)
        for t in range(4):
            assert back_tr.get_choices()[t, "z"] == pytest.approx(
                float(tr.get_choices()[t, "z"]), abs=1e-5
            )
        assert float(w1 + w2) == pytest.approx(0.0, abs=1e-4)

    def test_vmap_regenerate_roundtrip(self):
        vm = two_normals.vmap(in_axes=(0,))
        mus = jnp.zeros(3)
        tr = vm.simulate(KEY, (mus,))
        nd = g.Diff.tree_diff_no_change(tr.get_args())
        new_tr, w1, _, bwd = vm.edit(KEY, tr, g.Regenerate(g.S[..., "x"]), nd)
        back_tr, w2, _, _ = new_tr.edit(jax.random.key(9), bwd)
        for i in range(3):
            assert back_tr.get_choices()[i, "x"] == pytest.approx(
                float(tr.get_choices()[i, "x"]), abs=1e-5
            )
        assert float(w1 + w2) == pytest.approx(0.0, abs=1e-4)


class TestScanIndexEditRetvalConsistency:
    """Regression: an IndexRequest edit re-runs slice idx+1 under the new
    carry; when the kernel's y output reads the incoming carry, the new y
    must be spliced into the stacked retval — pre-fix the trace's retval
    kept the stale value at idx+1 while the inner trace held the new one."""

    def test_next_slice_y_spliced(self):
        @g.gen
        def kern(c, x):
            z = g.normal(c, 1.0) @ "z"
            return (z, c)  # y is the INCOMING carry

        m = kern.scan(n=6)
        tr, _ = m.generate(jax.random.key(0), g.ChoiceMap.empty(), (0.0, None))
        idx, new_val = 2, 7.5
        req = g.IndexRequest(jnp.asarray(idx), g.Update(g.C["z"].set(new_val)))
        new_tr, _w, _rd, _bwd = tr.edit(jax.random.key(1), req, ())
        _, ys = new_tr.get_retval()
        assert float(ys[idx + 1]) == pytest.approx(new_val)
        inner_y = jax.tree_util.tree_map(
            lambda v: v[idx + 1], new_tr.inner
        ).get_retval()[1]
        assert float(inner_y) == pytest.approx(new_val)

    def test_last_index_has_no_next_splice(self):
        @g.gen
        def kern(c, x):
            z = g.normal(c, 1.0) @ "z"
            return (z, c)

        m = kern.scan(n=4)
        tr, _ = m.generate(jax.random.key(0), g.ChoiceMap.empty(), (0.0, None))
        old_ys = tr.get_retval()[1]
        req = g.IndexRequest(jnp.asarray(3), g.Update(g.C["z"].set(2.0)))
        new_tr, _w, _rd, _bwd = tr.edit(jax.random.key(1), req, ())
        carry_out, ys = new_tr.get_retval()
        # editing the LAST slice: no next slice; earlier ys untouched,
        # final carry becomes the new z
        assert jnp.allclose(ys[:3], old_ys[:3])
        assert float(carry_out) == pytest.approx(2.0)


class TestDimapDiffPropagation:
    """Regression: Dimap.edit must propagate per-leaf change tangents
    through the pre mapping. Pre-fix it collapsed to blanket
    UnknownChange, so a Switch under or_else took its index-CHANGED path
    (resampling unconstrained choices, generate-style weight) whenever any
    outer arg changed — even with the flag untouched."""

    def _model(self):
        @g.gen
        def branch_if(mu):
            x = g.normal(mu, 1.0) @ "x"
            y = g.normal(x, 1.0) @ "y"
            return y

        @g.gen
        def branch_else(mu):
            z = g.normal(mu, 2.0) @ "z"
            return z

        return g.or_else(branch_if, branch_else)

    def test_unchanged_flag_changed_arg_keeps_choices(self):
        from genjax_tpu.core.diff import Diff, NoChange, UnknownChange

        m = self._model()
        tr = m.simulate(jax.random.key(0), (True, (0.0,), (0.0,)))
        old_x = float(tr.get_choices()["x"])
        argdiffs = (
            Diff(True, NoChange),
            (Diff(0.5, UnknownChange),),
            (Diff(0.0, NoChange),),
        )
        new_tr, w, _rd, _bwd = m.edit(
            jax.random.key(1), tr, g.Update(g.C.kw(y=1.0)), argdiffs
        )
        # Update semantics: the unconstrained choice is retained and the
        # weight is the update density ratio
        assert float(new_tr.get_choices()["x"]) == pytest.approx(old_x)
        assert float(w) == pytest.approx(
            float(new_tr.get_score() - tr.get_score()), abs=1e-5
        )

    def test_concrete_bool_keeps_inner_trace_access(self):
        m = self._model()
        tr = m.simulate(jax.random.key(0), (True, (0.0,), (0.0,)))
        # a concrete Python bool flag keeps the concrete-index fast path
        assert tr.get_inner_trace("x") is not None


class TestSwitchEditCheckify:
    """Regression: the index-changed edit path must suppress constraint
    validation like generate/assess do — multi_switch shape-traces every
    branch, so sibling-branch addresses in the constraint are not typos."""

    def test_index_change_edit_under_checkify(self):
        from genjax_tpu.core.diff import Diff, NoChange, UnknownChange
        from genjax_tpu.checkify import do_checkify

        @g.gen
        def b0():
            _ = g.normal(0.0, 1.0) @ "a"

        @g.gen
        def b1():
            _ = g.normal(0.0, 1.0) @ "b"

        sw = g.switch(b0, b1)
        tr = sw.simulate(jax.random.key(0), (0, (), ()))
        argdiffs = (Diff(1, UnknownChange), (), ())
        with do_checkify():
            new_tr, _w, _rd, _bwd = sw.edit(
                jax.random.key(1), tr, g.Update(g.C.kw(b=0.3)), argdiffs
            )
        v = new_tr.get_choices()["b"]
        v = v.unmask() if hasattr(v, "unmask") else v
        assert float(v) == pytest.approx(0.3)
