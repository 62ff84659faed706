"""Cross-cutting invariants for the tuning-free move requests
(EllipticalSlice / SliceSample) over a small model zoo: after ANY move,
the trace's stored score must equal a fresh assess of its choices, the
SMCP3 weight must be exactly 0, and the backward request must be of the
same type — the properties `mh` composition relies on."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genjax_tpu as g


@g.gen
def scalar_site():
    mu = g.normal(0.5, 1.2) @ "mu"
    g.normal(mu, 0.4) @ "y"


@g.gen
def nested():
    @g.gen
    def inner():
        return g.normal(0.0, 1.0) @ "a"

    x = inner() @ "sub"
    g.normal(x, 0.7) @ "y"


@g.gen
def vector_site():
    w = g.mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
    g.normal(jnp.sum(w), 0.5) @ "y"


@g.gen
def heavy_tail():
    x = g.laplace(0.0, 1.0) @ "x"
    g.normal(x, 0.6) @ "y"


CASES = [
    ("scalar-ess", scalar_site, g.S["mu"], "ess", dict(mean=0.5, chol=1.2)),
    ("scalar-slice", scalar_site, g.S["mu"], "slice", dict(width=1.0)),
    ("nested-slice", nested, g.S["sub", "a"], "slice", dict(width=1.0)),
    ("vector-ess", vector_site, g.S["w"], "ess", dict()),
    ("laplace-slice", heavy_tail, g.S["x"], "slice", dict(width=2.0)),
]


def make_request(kind, sel, kw):
    if kind == "ess":
        return g.EllipticalSlice(sel, **kw)
    return g.SliceSample(sel, **kw)


@pytest.mark.parametrize("spec", CASES, ids=[c[0] for c in CASES])
def test_move_invariants(spec):
    _, model, sel, kind, kw = spec
    req = make_request(kind, sel, kw)
    obs = g.C["y"].set(0.9)
    tr, _ = model.generate(jr.key(0), obs, ())
    for i in range(5):
        new, w, _, bwd = tr.edit(jr.fold_in(jr.key(1), i), req)
        assert float(w) == 0.0
        assert type(bwd) is type(req)
        score, _ = model.assess(new.get_choices(), ())
        np.testing.assert_allclose(
            float(new.get_score()), float(score), rtol=1e-5
        )
        # the observation is never touched by a latent move
        yv = new.get_choices()["y"]
        np.testing.assert_allclose(float(yv), 0.9)
        tr = new


def test_mh_accept_survives_callee_identity_churn():
    """A model whose body constructs a LOCAL @gen closure mints a fresh
    Closure every handler run, so old/new traces have unequal treedefs;
    mh_accept's leaf-aligned fallback must still produce a correct
    posterior (regression for the fallback path in requests/hmc.py)."""
    from genjax_tpu.inference.mcmc import mh

    @g.gen
    def churny():
        mu = g.normal(0.0, 1.0) @ "mu"

        @g.gen  # deliberately in-body: new identity per run
        def inner(m):
            return g.normal(m, 0.5) @ "y"

        inner(mu) @ "obs"

    obs = g.C["obs", "y"].set(1.6)
    v = 1.0 / (1.0 + 1.0 / 0.25)
    m_post = v * 1.6 / 0.25

    def one(k):
        k0, k1 = jr.split(k)
        tr, _ = churny.generate(k0, obs, ())

        def step(t, kk):
            t2, _ = mh(kk, t, g.HMC(g.S["mu"], 0.3, L=5))
            return t2, None

        tr, _ = jax.lax.scan(step, tr, jr.split(k1, 200))
        return tr.get_choices()["mu"]

    mus = np.asarray(jax.jit(jax.vmap(one))(jr.split(jr.key(11), 256)))
    np.testing.assert_allclose(mus.mean(), m_post, atol=0.07)
    np.testing.assert_allclose(mus.var(), v, rtol=0.25)


def test_mh_accept_rejects_real_structural_mismatch():
    """Traces with equal leaf counts but different leaf shapes must still
    raise — the fallback is for static-identity churn only."""
    import jax.tree_util as jtu
    from genjax_tpu.inference.requests.hmc import mh_accept

    a = {"x": jnp.zeros(3), "y": jnp.zeros(())}
    b = {"x": jnp.zeros(()), "y": jnp.zeros(3)}
    # force the treedef-mismatch path with a wrapper dataclass pair

    @g.Pytree.dataclass
    class Box(g.Pytree):
        v: object
        tag: object = g.Pytree.static(default=None)

    with pytest.raises(ValueError):
        mh_accept(
            jr.key(0), Box(a, tag="p"), Box(b, tag="q"), jnp.asarray(0.0)
        )


@pytest.mark.parametrize("spec", CASES[:3], ids=[c[0] for c in CASES[:3]])
def test_moves_compose_under_jit_scan(spec):
    """A whole chain of moves jits into one program with finite,
    assess-consistent terminal state."""
    _, model, sel, kind, kw = spec
    req = make_request(kind, sel, kw)
    obs = g.C["y"].set(0.9)

    @jax.jit
    def chain(key):
        k0, k1 = jr.split(key)
        tr, _ = model.generate(k0, obs, ())

        def step(t, kk):
            t2, _, _, _ = t.edit(kk, req)
            return t2, None

        tr, _ = jax.lax.scan(step, tr, jr.split(k1, 50))
        return tr

    tr = chain(jr.key(7))
    score, _ = model.assess(tr.get_choices(), ())
    np.testing.assert_allclose(
        float(tr.get_score()), float(score), rtol=1e-5
    )
