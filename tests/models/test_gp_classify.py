"""GP classification (Laplace): the Newton mode must satisfy the exact
stationarity condition; the curvature must match a finite-difference
Hessian; and ESS (exact latent sampling) must agree with the
approximation's mode on mild data — the audit loop the docstring
advertises."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.kernels.elliptical import ess_sweep_cols
from genjax_tpu.models.gp import (
    gp_classify_laplace,
    gp_classify_predict,
    sq_exp_kernel,
)

rng = np.random.RandomState(0)
N = 14
X = np.sort(rng.uniform(-2, 2, (N, 1)), axis=0).astype(np.float32)
AMP, LS = 1.5, 0.8
K = np.asarray(sq_exp_kernel(X, X, AMP, LS)) + 1e-5 * np.eye(N)
F_TRUE = rng.multivariate_normal(np.zeros(N), K)
Y = (rng.rand(N) < 1.0 / (1.0 + np.exp(-F_TRUE))).astype(np.float32)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestLaplaceFit:
    def test_mode_stationarity_exact(self):
        """At the mode, f = K (y − π(f)) (RW 3.17) — the stable form of
        the stationarity condition (the K⁻¹-gradient form amplifies fp32
        roundoff through K's small eigenvalues)."""
        f_hat, _, _ = gp_classify_laplace(X, Y, AMP, LS)
        f = np.asarray(f_hat)
        resid = f - K @ (Y - sigmoid(f))
        assert np.abs(resid).max() < 5e-3, resid

    def test_covariance_matches_fd_hessian(self):
        f_hat, cov, _ = gp_classify_laplace(X, Y, AMP, LS)
        f = np.asarray(f_hat)
        W = sigmoid(f) * (1.0 - sigmoid(f))
        H = np.linalg.inv(K) + np.diag(W)
        np.testing.assert_allclose(
            np.asarray(cov), np.linalg.inv(H), rtol=1e-3, atol=1e-4
        )

    def test_ess_audit_agrees_with_mode(self):
        """Exact latent sampling via elliptical slice: posterior mean of
        f within a small band of the Laplace mode (the logistic posterior
        is log-concave and near-Gaussian at this N)."""
        chol = jnp.asarray(np.linalg.cholesky(K))
        y = jnp.asarray(Y)

        def ll(f_cols):
            return jnp.sum(
                y[:, None] * f_cols - jnp.logaddexp(0.0, f_cols), axis=0
            )

        f_cols, _ = jax.jit(
            lambda: ess_sweep_cols(
                ll,
                jnp.zeros((N, 2048), jnp.float32),
                0,
                n_steps=300,
                chol_prior=chol,
            )
        )()
        f_hat, _, _ = gp_classify_laplace(X, Y, AMP, LS)
        np.testing.assert_allclose(
            np.asarray(f_cols).mean(axis=1), np.asarray(f_hat), atol=0.25
        )

    def test_predictions_track_separable_labels(self):
        """On a cleanly separable dataset (y = [x > 0]) the predictive
        probabilities must side with the labels away from the boundary
        and the latent variance must be nonnegative."""
        y_sep = (X[:, 0] > 0).astype(np.float32)
        probs, _, var = gp_classify_predict(X, y_sep, X, AMP, LS)
        probs = np.asarray(probs)
        clear = np.abs(X[:, 0]) > 0.5
        acc = ((probs > 0.5) == (y_sep > 0.5))[clear].mean()
        assert acc == 1.0, (probs, y_sep)
        assert np.all(np.asarray(var) >= -1e-5)
