"""Dense-HMM tools vs brute-force enumeration over all N^T state paths
(N=3, T=6 — exact ground truth), plus Baum-Welch ascent/recovery."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.dists.hmm_tools import (
    forward_backward,
    hmm_em,
    hmm_log_marginal,
    hmm_posterior_sample,
    viterbi,
)

N, M, T = 3, 4, 6
rng = np.random.RandomState(0)
PI = rng.dirichlet(np.ones(N))
TRANS = rng.dirichlet(np.ones(N), size=N)
OBS = rng.dirichlet(np.ones(M), size=N)
YS = rng.randint(0, M, size=T)

LP, LT, LO = (
    jnp.log(jnp.asarray(PI, jnp.float32)),
    jnp.log(jnp.asarray(TRANS, jnp.float32)),
    jnp.log(jnp.asarray(OBS, jnp.float32)),
)


def enumerate_paths():
    rows = []
    for zs in itertools.product(range(N), repeat=T):
        lp = np.log(PI[zs[0]]) + np.log(OBS[zs[0], YS[0]])
        for t in range(1, T):
            lp += np.log(TRANS[zs[t - 1], zs[t]]) + np.log(
                OBS[zs[t], YS[t]]
            )
        rows.append((zs, lp))
    return rows


PATHS = enumerate_paths()
LOGZ = float(
    np.logaddexp.reduce(np.asarray([lp for _, lp in PATHS]))
)


class TestExactness:
    def test_log_marginal(self):
        np.testing.assert_allclose(
            float(hmm_log_marginal(LP, LT, LO, jnp.asarray(YS))),
            LOGZ,
            rtol=1e-5,
        )

    def test_smoothed_marginals_match_enumeration(self):
        post = forward_backward(LP, LT, LO, jnp.asarray(YS))
        gammas = np.exp(np.asarray(post.log_gammas))
        exact = np.zeros((T, N))
        for zs, lp in PATHS:
            w = np.exp(lp - LOGZ)
            for t, z in enumerate(zs):
                exact[t, z] += w
        np.testing.assert_allclose(gammas, exact, atol=1e-5)
        np.testing.assert_allclose(
            float(post.log_marginal), LOGZ, rtol=1e-5
        )

    def test_pairwise_marginals_match_enumeration(self):
        post = forward_backward(LP, LT, LO, jnp.asarray(YS))
        xis = np.exp(np.asarray(post.log_xis))
        exact = np.zeros((T - 1, N, N))
        for zs, lp in PATHS:
            w = np.exp(lp - LOGZ)
            for t in range(T - 1):
                exact[t, zs[t], zs[t + 1]] += w
        np.testing.assert_allclose(xis, exact, atol=1e-5)

    def test_ffbs_path_frequencies_match_enumeration(self):
        """Joint FFBS draws: both the per-step marginals AND a pairwise
        (t, t+1) joint frequency must match the enumerated posterior."""
        import jax
        import jax.random as jr

        n = 6000
        paths, _ = jax.jit(
            jax.vmap(
                lambda k: hmm_posterior_sample(
                    k, LP, LT, LO, jnp.asarray(YS)
                )
            )
        )(jr.split(jr.key(0), n))
        paths = np.asarray(paths)
        exact_marg = np.zeros((T, N))
        exact_pair = np.zeros((N, N))  # at (t, t+1) = (2, 3)
        for zs, lp in PATHS:
            w = np.exp(lp - LOGZ)
            for t, z in enumerate(zs):
                exact_marg[t, z] += w
            exact_pair[zs[2], zs[3]] += w
        for t in range(T):
            freq = np.bincount(paths[:, t], minlength=N) / n
            np.testing.assert_allclose(freq, exact_marg[t], atol=0.03)
        pair = np.zeros((N, N))
        for a, b in zip(paths[:, 2], paths[:, 3]):
            pair[a, b] += 1.0 / n
        np.testing.assert_allclose(pair, exact_pair, atol=0.03)

    def test_viterbi_matches_brute_force(self):
        best_zs, best_lp = max(PATHS, key=lambda r: r[1])
        path, lp = viterbi(LP, LT, LO, jnp.asarray(YS))
        assert tuple(np.asarray(path)) == best_zs
        np.testing.assert_allclose(float(lp), best_lp, rtol=1e-5)


class TestBaumWelch:
    @staticmethod
    def _series(T, seed=1):
        r = np.random.RandomState(seed)
        trans = np.asarray([[0.9, 0.1], [0.2, 0.8]])
        obs = np.asarray([[0.8, 0.2], [0.25, 0.75]])
        z = r.choice(2)
        ys = []
        for _ in range(T):
            ys.append(r.choice(2, p=obs[z]))
            z = r.choice(2, p=trans[z])
        return np.asarray(ys), trans, obs

    def test_monotone_ascent(self):
        ys, _, _ = self._series(200)
        lp = jnp.log(jnp.asarray([0.5, 0.5]))
        lt = jnp.log(jnp.asarray([[0.6, 0.4], [0.4, 0.6]]))
        lo = jnp.log(jnp.asarray([[0.6, 0.4], [0.45, 0.55]]))
        _, lms = jax.jit(
            lambda: hmm_em(lp, lt, lo, jnp.asarray(ys), n_iters=30)
        )()
        lms = np.asarray(lms)
        assert np.all(np.diff(lms) > -1e-3), lms

    def test_unreachable_state_does_not_poison_em(self):
        """A structurally unreachable state (zero posterior mass) must
        keep its old parameters instead of NaN-poisoning the whole model
        (regression: 0/0 in the M-step row normalization)."""
        ys, _, _ = self._series(100)
        lp = jnp.log(jnp.asarray([0.5, 0.5, 1e-30]))
        # no transitions INTO state 2
        lt = jnp.log(
            jnp.asarray(
                [[0.6, 0.4, 1e-30], [0.4, 0.6, 1e-30], [0.3, 0.3, 0.4]]
            )
        )
        lo = jnp.log(
            jnp.asarray([[0.6, 0.4], [0.45, 0.55], [0.5, 0.5]])
        )
        (lp_f, lt_f, lo_f), lms = hmm_em(
            lp, lt, lo, jnp.asarray(ys), n_iters=10
        )
        assert np.isfinite(np.asarray(lms)).all()
        for arr in (lt_f, lo_f):
            a = np.asarray(arr)
            assert not np.isnan(a).any(), a
        lms = np.asarray(lms)
        assert np.all(np.diff(lms) > -1e-3)

    def test_recovers_transition_structure(self):
        ys, trans, obs = self._series(4000, seed=2)
        lp = jnp.log(jnp.asarray([0.5, 0.5]))
        lt = jnp.log(jnp.asarray([[0.7, 0.3], [0.3, 0.7]]))
        (lp_f, lt_f, lo_f), _ = jax.jit(
            lambda: hmm_em(
                lp,
                lt,
                jnp.log(jnp.asarray(obs, jnp.float32)),
                jnp.asarray(ys),
                n_iters=60,
                fit=("pi", "trans"),
            )
        )()
        np.testing.assert_allclose(
            np.exp(np.asarray(lt_f)), trans, atol=0.06
        )
        # frozen emissions untouched
        np.testing.assert_allclose(
            np.exp(np.asarray(lo_f)), obs, atol=1e-6
        )
