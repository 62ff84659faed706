"""The Generative Function Interface, end to end.

Port of /root/reference/docs/cookbook/active/generative_function_interface.ipynb.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g


@g.gen
def model(mu):
    x = g.normal(mu, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return y


def main():
    key = jax.random.key(0)

    # --- simulate: sample (choices, retval, score) ---
    tr = model.simulate(key, (0.0,))
    print("choices:", {a: float(tr.get_choices()[a]) for a in ("x", "y")})

    # --- assess: exact joint density of a full assignment ---
    chm = g.C.d({"x": 1.0, "y": 1.2})
    score, retval = model.assess(chm, (0.0,))
    print("assess:", score)

    # --- importance/generate: partial constraints, weighted ---
    tr, w = model.importance(key, g.C["y"].set(2.0), (0.0,))
    print("importance weight (= logpdf of y | x):", w)

    # --- update: edit a trace, get the SMCP3 weight + discard ---
    new_tr, w, _retdiff, discard = tr.update(key, g.C["x"].set(0.5))
    print("update weight:", w, " discarded x:", discard["x"])

    # --- regenerate: resample selected addresses from the prior ---
    # (note: use a fresh key — reusing the key that created the trace would
    # resample identical values, a standard JAX-PRNG footgun)
    new_tr, w, _rd, bwd = tr.edit(jax.random.key(99), g.Regenerate(g.S["x"]))
    print("regenerate weight:", w)

    # --- project: density of a sub-selection ---
    print("project x:", tr.project(key, g.S["x"]))
    print("project all == score:", tr.project(key, g.Selection.all()), tr.get_score())

    # --- propose ---
    choices, score, retval = model.propose(key, (0.0,))
    print("propose score:", score)


if __name__ == "__main__":
    main()
