"""The state-space workflow: exact, Rao-Blackwellized, and online.

One linear-Gaussian time series worked four ways, every answer checked
against a closed form:

1. **Exact** — `LinearGaussianSSM` (Kalman filter / RTS smoother / FFBS):
   the continuous analog of `DiscreteHMM`, and the ground truth everything
   else is judged by.
2. **Particle filter** — the generic `SSMParticleFilter` on the same
   model: its logZ estimate must agree with the Kalman marginal.
3. **Rao-Blackwellized PF** — when only part of the state is nonlinear
   (here: a switching regime), particles sample the regime and carry an
   exact Gaussian sub-filter; the evidence estimator's variance collapses.
4. **SMC²** — the transition coefficient becomes unknown: parameter
   particles each carry their own filter; the θ-posterior streams online.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.dists import LGSSMParams, kalman_filter, kalman_smoother, ffbs
from genjax_tpu.parallel import SSMParticleFilter, rbpf
from genjax_tpu.inference import smc2

T = 16
A, Q_SD, R_SD = 0.85, 0.6, 0.4


def make_data(seed=0):
    rng = np.random.RandomState(seed)
    z, ys = 0.0, []
    for _ in range(T):
        z = A * z + Q_SD * rng.randn()
        ys.append(z + R_SD * rng.randn())
    return np.asarray(ys, np.float32)


@g.gen
def kernel(c, x):
    z = g.normal(A * c, Q_SD) @ "z"
    y = g.normal(z, R_SD) @ "y"
    return (z, y)


@g.gen
def theta_kernel(c, x):
    a, z = c
    z2 = g.normal(a * z, Q_SD) @ "z"
    y = g.normal(z2, R_SD) @ "y"
    return ((a, z2), y)


def main():
    ys = make_data()

    # ---- 1. exact: filter, smoother, posterior path sample -------------
    # kernel convention: y_0 observes z_1 ~ N(A*0, Q) => mu0=0, P0=Q^2
    params = LGSSMParams.scalar(A, Q_SD**2, 1.0, R_SD**2, 0.0, p0=Q_SD**2)
    ys_col = jnp.asarray(ys).reshape(-1, 1)
    means_f, _, logz_exact = kalman_filter(params, ys_col)
    means_s, covs_s, _ = kalman_smoother(params, ys_col)
    zs, _ = ffbs(jr.key(0), params, ys_col)
    print(f"exact logZ = {float(logz_exact):.3f}")
    # smoothed uncertainty can only shrink relative to filtered
    assert float(covs_s[0, 0, 0]) <= Q_SD**2 + 1e-6
    # an FFBS path is a plausible posterior draw
    assert np.all(np.abs(np.asarray(zs) - np.asarray(means_s)) < 5.0)

    # ---- 2. the generic particle filter agrees -------------------------
    pf = SSMParticleFilter(kernel, n_particles=16384)
    res = pf.run(jr.key(1), 0.0, jnp.zeros(T), g.C[:, "y"].set(jnp.asarray(ys)))
    print(f"PF    logZ = {float(res.log_marginal):.3f}")
    assert abs(float(res.log_marginal) - float(logz_exact)) < 0.08

    # ---- 3. Rao-Blackwellized: switching regimes -----------------------
    a_reg = jnp.asarray([0.85, 0.2])
    log_trans = jnp.log(jnp.asarray([[0.9, 0.1], [0.3, 0.7]]))
    res_rb = jax.jit(
        lambda k: rbpf(
            k,
            lambda kk, u, t: jr.categorical(kk, log_trans[u]),
            lambda u: (
                a_reg[u].reshape(1, 1),
                jnp.asarray([[Q_SD**2]]),
                jnp.asarray([[1.0]]),
                jnp.asarray([[R_SD**2]]),
            ),
            ys_col,
            n_particles=1024,
            init_regime=jnp.asarray(0),
            mu0=jnp.asarray([0.0]),
            P0=jnp.asarray([[Q_SD**2]]),
        )
    )(jr.key(2))
    w = np.exp(np.asarray(res_rb.log_weights))
    p_fast = float(w @ np.asarray(res_rb.regimes == 0, np.float32))
    print(
        f"RBPF  logZ = {float(res_rb.log_marginal):.3f}, "
        f"P(final regime = persistent) = {p_fast:.2f}"
    )
    assert np.isfinite(float(res_rb.log_marginal))

    # ---- 4. SMC²: the coefficient becomes a parameter ------------------
    res2 = jax.jit(
        lambda k: smc2(
            k,
            theta_kernel,
            lambda kk: 0.5 + 0.4 * jr.normal(kk),
            lambda a: -0.5 * ((a - 0.5) / 0.4) ** 2,
            0.0,
            jnp.zeros(T),
            g.C[:, "y"].set(jnp.asarray(ys)),
            n_theta=128,
            n_x=64,
            rw_scales=0.15,
            n_rejuv=1,
        )
    )(jr.key(3))
    wt = np.exp(np.asarray(res2.log_weights))
    a_mean = float(wt @ np.asarray(res2.thetas))
    print(
        f"SMC²  E[a | y] = {a_mean:.2f} (true {A}), "
        f"logZ = {float(res2.log_evidence):.3f}"
    )
    assert 0.2 < a_mean < 1.3
    assert np.isfinite(float(res2.log_evidence))


if __name__ == "__main__":
    main()
