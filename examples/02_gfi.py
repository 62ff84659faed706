"""The Generative Function Interface, end to end.

Cookbook-parity narrative for
/root/reference/docs/cookbook/active/generative_function_interface.ipynb:
simulate / assess / generate / update-with-argdiffs / project / propose,
plus the trace accessor methods — each step asserted so CI catches drift
(tests/test_examples.py runs this file).
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as st

import genjax_tpu as g
from genjax_tpu.core.diff import Diff


@g.gen
def model(mu):
    x = g.normal(mu, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return y


def main():
    key = jax.random.key(0)

    # 1) simulate: sample a traced execution --------------------------------
    tr = model.simulate(key, (0.0,))
    x, y = (float(tr.get_choices()[a]) for a in ("x", "y"))

    # 2) log probabilities --------------------------------------------------
    # 2.1 score of the trace = log-joint of its choices
    expected = st.norm.logpdf(x, 0.0, 1.0) + st.norm.logpdf(y, x, 0.5)
    assert abs(float(tr.get_score()) - float(expected)) < 1e-5
    # 2.2 log-probability of a COMPLETE assignment via assess
    chm = g.C.d({"x": 1.0, "y": 1.2})
    score, retval = model.assess(chm, (0.0,))
    exact = st.norm.logpdf(1.0, 0.0, 1.0) + st.norm.logpdf(1.2, 1.0, 0.5)
    assert abs(float(score) - float(exact)) < 1e-5
    assert float(retval) == 1.2

    # 3) generate: sample conditioned on (partial) observations -------------
    tr_c, w = model.importance(key, g.C["y"].set(2.0), (0.0,))
    # the weight is the observation's density given the sampled latents
    x_c = float(tr_c.get_choices()["x"])
    assert abs(float(w) - float(st.norm.logpdf(2.0, x_c, 0.5))) < 1e-5
    assert float(tr_c.get_choices()["y"]) == 2.0

    # 4) update: incremental trace edits with argdiffs ----------------------
    # 4.1 constraint-only update (arguments unchanged)
    new_tr, w_up, _retdiff, discard = tr.update(key, g.C["x"].set(0.5))
    # the discard holds the replaced value; weight = score delta
    assert float(discard["x"]) == x
    assert abs(
        float(w_up) - (float(new_tr.get_score()) - float(tr.get_score()))
    ) < 1e-5
    # untouched choices keep their values
    assert float(new_tr.get_choices()["y"]) == y
    # 4.2 changed arguments: state the change precisely with Diff — NoChange
    # inputs let the incremental engine skip re-scoring non-dependents
    new_tr2, w_arg, _rd, _bwd = model.edit(
        key, tr, g.Update(g.C.empty()), (Diff.unknown_change(1.0),)
    )
    # only "x" depends on mu: the weight is its re-score delta
    delta = st.norm.logpdf(x, 1.0, 1.0) - st.norm.logpdf(x, 0.0, 1.0)
    assert abs(float(w_arg) - float(delta)) < 1e-5
    # the relation new_score = old_score + weight holds for updates
    assert abs(
        float(new_tr2.get_score()) - (float(tr.get_score()) + float(w_arg))
    ) < 1e-5

    # regenerate: resample selected addresses from the prior ---------------
    # (fresh key — reusing the trace's key would resample identical values)
    re_tr, w_re, _rd, bwd = tr.edit(jax.random.key(99), g.Regenerate(g.S["x"]))
    assert float(re_tr.get_choices()["x"]) != x
    # SMCP3: applying the backward request cancels the forward weight
    back, w_b, _, _ = re_tr.edit(jax.random.key(100), bwd)
    assert abs(float(w_re) + float(w_b)) < 1e-4

    # project: density of a sub-selection -----------------------------------
    px = float(tr.project(key, g.S["x"]))
    assert abs(px - float(st.norm.logpdf(x, 0.0, 1.0))) < 1e-5
    assert abs(
        float(tr.project(key, g.Selection.all())) - float(tr.get_score())
    ) < 1e-5

    # 5) convenience methods -----------------------------------------------
    # 5.1 propose: (choices, score, retval) without building a trace
    choices, score, retval = model.propose(key, (0.0,))
    assert jnp.isfinite(score)
    # 5.2/5.3 trace accessors
    assert tr.get_gen_fn() is model
    assert tr.get_args() == (0.0,)
    # 5.4 subtrace access by address
    sub = tr.get_subtrace("x")
    assert float(sub.get_retval()) == x

    print("GFI cookbook: all sections OK")


if __name__ == "__main__":
    main()
