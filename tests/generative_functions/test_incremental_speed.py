"""The incremental-computation payoff, quantified.

Parity target: the reference's speed-gains demo
(/root/reference/docs/cookbook/inactive/update/3_speed_gains.ipynb) shows
update-vs-resimulate gains qualitatively. Here the claim is checked
structurally: the compiled FLOP count of an O(1) ``IndexRequest`` edit must
not grow with sequence length, while dense re-walks grow linearly.
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g


@g.gen
def kernel(c, x):
    z = g.normal(c, 1.0) @ "z"
    y = g.normal(z, 0.5) @ "y"
    return (z, y)


def flops_of(fn, *args):
    analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(analysis, list):  # older jax returns [dict]
        analysis = analysis[0]
    return analysis.get("flops", 0.0)


class TestIndexEditScaling:
    def test_index_edit_flops_are_length_independent(self):
        key = jax.random.key(0)
        req = g.IndexRequest(jnp.asarray(2), g.Update(g.C["z"].set(0.5)))

        def index_edit(tr):
            new_tr, w, _, _ = tr.edit(key, req)
            return new_tr.get_choices()[3, "z"], w

        def dense_update(tr, T):
            new_tr, w, _, _ = tr.update(key, g.C[2, "z"].set(0.5))
            return new_tr.get_choices()[3, "z"], w

        sc = kernel.scan()
        flops = {}
        for T in (64, 1024):
            tr = sc.simulate(key, (0.0, jnp.zeros(T)))
            flops[T] = {
                "index": flops_of(index_edit, tr),
                "dense": flops_of(lambda tr: dense_update(tr, T), tr),
            }

        # O(1): the index edit's compute does not scale with T (the only
        # growth allowed is the trivial scatter into the length-T buffers)
        growth_index = flops[1024]["index"] / max(flops[64]["index"], 1.0)
        growth_dense = flops[1024]["dense"] / max(flops[64]["dense"], 1.0)
        assert growth_index < 3.0, flops
        assert growth_dense > 8.0, flops
        # and at long lengths the dense walk costs far more
        assert flops[1024]["dense"] > 5.0 * flops[1024]["index"], flops


class TestCleanPrefixEdits:
    def test_single_address_edit_cost_scales_with_suffix(self):
        """The clean-prefix optimization: editing the LAST address of a long
        chain model costs a fraction of editing the FIRST (which dirties
        everything downstream)."""
        n_addr = 12

        @g.gen
        def chain_model():
            x = g.normal(0.0, 1.0) @ "a0"
            for i in range(1, n_addr):
                x = g.normal(x, 1.0) @ f"a{i}"
            return x

        key = jax.random.key(0)
        tr = chain_model.simulate(key, ())

        def edit_first(tr):
            new_tr, w, _, _ = tr.update(key, g.C["a0"].set(0.5))
            return new_tr.get_score(), w

        def edit_last(tr):
            new_tr, w, _, _ = tr.update(key, g.C[f"a{n_addr-1}"].set(0.5))
            return new_tr.get_score(), w

        f_first = flops_of(edit_first, tr)
        f_last = flops_of(edit_last, tr)
        # editing the last address re-scores only itself; the first re-scores
        # the entire suffix
        assert f_last < 0.5 * f_first, (f_first, f_last)

    def test_clean_edit_reports_nochange_retdiff(self):
        @g.gen
        def m():
            x = g.normal(0.0, 1.0) @ "x"
            return x

        key = jax.random.key(0)
        tr = m.simulate(key, ())
        nd = g.Diff.tree_diff_no_change(())
        _, w, retdiff, _ = m.edit(key, tr, g.Update(g.C.empty()), nd)
        assert g.Diff.static_check_no_change(retdiff)
        assert float(w) == 0.0
