"""Elliptical slice sampling (Murray, Adams & MacKay 2010) in the column
layout — the tuning-free exact sampler for latent-Gaussian models.

No reference counterpart (the reference's only gradient-free move is
prior-proposal `Regenerate` MH — `/root/reference/src/genjax/_src/core/
generative/requests.py:64` — which mixes arbitrarily slowly when the
likelihood is informative). ESS targets

    p(f) ∝ N(f; mu, Sigma) · L(f)

with NO step size, NO trajectory length, and acceptance probability 1:
each transition draws an auxiliary ellipse through the current state and a
prior sample, then shrinks an angle bracket until the likelihood threshold
is met. It is the standard production sampler for GP latents
(`models/gp.py` provides the Gram/Cholesky machinery).

TPU batching: positions are chains-on-lanes ``(D, N)``. All chains run the
shrink loop in ONE ``lax.while_loop`` with a per-chain done mask — finished
chains idle (their state is frozen by ``jnp.where``) until the slowest
chain accepts. The expected iteration count is small and dimension-free
(geometric with rate ≈ the slice fraction), so lock-step masking wastes
little; the loop body is a likelihood evaluation, which is where the FLOPs
are anyway.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import jax.random as jr
from jax import lax

_TWO_PI = 6.283185307179586


def ess_transition_cols(
    log_lik_cols: Callable,
    q,
    key,
    *,
    chol_prior,
    mean=0.0,
    max_iters: int = 64,
):
    """One elliptical-slice transition for every chain column.

    Args:
        log_lik_cols: ``(D, N) -> (N,)`` log-likelihood (NOT including the
            Gaussian prior — the prior is sampled exactly on the ellipse).
        q: ``(D, N)`` current positions.
        chol_prior: ``(D, D)`` lower Cholesky factor of the prior
            covariance (or a ``(D,)``/scalar standard deviation for a
            diagonal prior).
        mean: prior mean — scalar, ``(D,)``, or ``(D, 1)``.
        max_iters: hard cap on shrink iterations (a safety net — the
            shrink loop terminates with probability 1; at the cap the
            current point is kept, an exact no-op move).

    Returns ``(q_new, n_iters)`` with ``n_iters`` the ``(N,)`` per-chain
    shrink-iteration counts (diagnostic; 0 = first proposal accepted).
    """
    d, n = q.shape
    mean = jnp.asarray(mean, q.dtype)
    if mean.ndim == 1:
        mean = mean.reshape(-1, 1)
    mean = jnp.broadcast_to(mean, (d, 1))
    k_nu, k_u, k_theta = jr.split(key, 3)
    z = jr.normal(k_nu, (d, n), q.dtype)
    chol_prior = jnp.asarray(chol_prior, q.dtype)
    if chol_prior.ndim == 2:
        nu = chol_prior @ z
    else:
        nu = chol_prior.reshape(-1, 1) * z if chol_prior.ndim == 1 else chol_prior * z

    log_y = log_lik_cols(q) + jnp.log(jr.uniform(k_u, (n,), q.dtype))
    theta0 = jr.uniform(k_theta, (n,), q.dtype) * _TWO_PI
    lo0, hi0 = theta0 - _TWO_PI, theta0

    centered = q - mean

    def proposal(theta):
        return mean + centered * jnp.cos(theta) + nu * jnp.sin(theta)

    q1 = proposal(theta0)
    done0 = log_lik_cols(q1) > log_y

    def cond(state):
        i, _, _, _, _, done, _counts = state
        return jnp.logical_and(i < max_iters, ~jnp.all(done))

    # The loop carries only (N,)-vectors — brackets, angles, flags — and
    # the ACCEPTED ANGLE per chain; the (D, N) accepted-position buffer is
    # reconstructed ONCE after the loop from theta_acc. Carrying the
    # position itself cost an extra read+write of the full state every
    # body execution (~2x the loop's HBM traffic; the lock-step loop runs
    # to the max iteration count over all N chains, so every byte in the
    # body is paid that many times).
    def body(state):
        i, theta_acc, lo, hi, theta, done, counts = state
        # shrink the bracket toward 0 on the rejected side
        lo = jnp.where(jnp.logical_or(done, theta >= 0), lo, theta)
        hi = jnp.where(jnp.logical_or(done, theta >= 0), theta, hi)
        k = jr.fold_in(k_theta, i + 1)
        theta_new = lo + (hi - lo) * jr.uniform(k, (n,), q.dtype)
        theta = jnp.where(done, theta, theta_new)
        ok = log_lik_cols(proposal(theta)) > log_y
        accept_now = jnp.logical_and(~done, ok)
        theta_acc = jnp.where(accept_now, theta, theta_acc)
        counts = counts + jnp.asarray(~done, counts.dtype)
        return (
            i + 1, theta_acc, lo, hi, theta,
            jnp.logical_or(done, ok), counts,
        )

    counts0 = jnp.zeros((n,), jnp.int32)
    _, theta_acc, _, _, _, done, n_iters = lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0),
            theta0,
            lo0,
            hi0,
            theta0,
            done0,
            counts0,
        ),
    )
    # chains that hit the cap keep their current point (exact no-op)
    q_new = jnp.where(done[None, :], proposal(theta_acc), q)
    return q_new, n_iters


def ess_sweep_cols(
    log_lik_cols: Callable,
    q0,
    seed: int,
    *,
    n_steps: int,
    chol_prior,
    mean=0.0,
    max_iters: int = 64,
    collect: bool = False,
    rng_impl: str | None = None,
):
    """``n_steps`` elliptical-slice transitions in one ``lax.scan``.
    Returns ``(q_final, draws)`` with ``draws`` of shape
    ``(n_steps, D, N)`` when ``collect`` else ``None``.

    ``rng_impl="rbg"`` switches the PRNG to RngBitGenerator — measured
    ~1.3x on the bulk ``(D, N)`` ellipse draws that dominate the
    transition (same tradeoff as ``kernels.chees``; threefry default
    keeps cross-impl reproducibility)."""
    q0 = jnp.asarray(q0, jnp.float32)
    root = (
        jr.key(seed ^ 0xE5517, impl=rng_impl)
        if rng_impl
        else jr.key(seed ^ 0xE5517)
    )

    def step(q, i):
        q, _ = ess_transition_cols(
            log_lik_cols,
            q,
            jr.fold_in(root, i),
            chol_prior=chol_prior,
            mean=mean,
            max_iters=max_iters,
        )
        return q, (q if collect else None)

    q, draws = lax.scan(step, q0, jnp.arange(n_steps))
    return q, draws


def ess_transition_gauss_cols(
    q,
    key,
    *,
    chol_prior,
    y,
    prec=1.0,
    mean=0.0,
    max_iters: int = 64,
):
    """One elliptical-slice transition specialized to a GAUSSIAN (more
    generally, diagonal-quadratic) log-likelihood

        ll(f) = -0.5 * sum_d prec_d * (f_d - y_d)^2   (+ const)

    — the canonical GP-regression case. Along the ellipse
    ``f(theta) = m + c cos(theta) + nu sin(theta)`` the log-likelihood is
    an explicit trigonometric quadratic,

        ll(theta) = -0.5 [ A cos^2 + B sin^2 + 2C cos sin
                           + 2D cos + 2E sin + F ],

    whose six coefficients are per-chain REDUCTIONS over dimensions,
    computed ONCE per transition. Every shrink iteration then evaluates
    ll(theta) from six (N,) vectors in O(N) — no (D, N) traffic at all —
    so the lock-step while_loop (which runs to the max shrink count over
    all N chains) costs essentially nothing and the transition is bound
    by the ellipse-draw matmul ``chol_prior @ z``. Identical Markov
    chain to :func:`ess_transition_cols` with the matching likelihood:
    the same randomness stream drives the same accept/shrink decisions
    (up to float roundoff in the likelihood evaluation).

    Args:
        y: ``(D,)`` or ``(D, 1)`` observations.
        prec: scalar or ``(D,)``/``(D, 1)`` observation precisions
            (1/sigma^2).

    Returns ``(q_new, n_iters)`` as :func:`ess_transition_cols`.
    """
    d, n = q.shape
    mean = jnp.asarray(mean, q.dtype)
    if mean.ndim == 1:
        mean = mean.reshape(-1, 1)
    mean = jnp.broadcast_to(mean, (d, 1))
    y = jnp.asarray(y, q.dtype).reshape(d, 1)
    prec = jnp.asarray(prec, q.dtype)
    if prec.ndim == 1:
        prec = prec.reshape(-1, 1)

    k_nu, k_u, k_theta = jr.split(key, 3)
    z = jr.normal(k_nu, (d, n), q.dtype)
    chol_prior = jnp.asarray(chol_prior, q.dtype)
    if chol_prior.ndim == 2:
        nu = chol_prior @ z
    else:
        nu = (
            chol_prior.reshape(-1, 1) * z
            if chol_prior.ndim == 1
            else chol_prior * z
        )

    c = q - mean
    r0 = mean - y  # (D, 1): chain-independent residual of the prior mean
    # six trig-quadratic coefficients, one fused pass over the (D, N) state
    A = jnp.sum(prec * c * c, axis=0)
    B = jnp.sum(prec * nu * nu, axis=0)
    Cc = jnp.sum(prec * c * nu, axis=0)
    Dc = jnp.sum(prec * c * r0, axis=0)
    E = jnp.sum(prec * nu * r0, axis=0)
    F = jnp.sum(prec * r0 * r0)  # scalar

    def ll_theta(theta):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        return -0.5 * (
            A * ct * ct
            + B * st * st
            + 2.0 * Cc * ct * st
            + 2.0 * Dc * ct
            + 2.0 * E * st
            + F
        )

    # ll at the current point is theta = 0: cos=1, sin=0
    log_y = -0.5 * (A + 2.0 * Dc + F) + jnp.log(
        jr.uniform(k_u, (n,), q.dtype)
    )
    theta0 = jr.uniform(k_theta, (n,), q.dtype) * _TWO_PI
    lo0, hi0 = theta0 - _TWO_PI, theta0
    done0 = ll_theta(theta0) > log_y

    def cond(state):
        i, _, _, _, _, done, _counts = state
        return jnp.logical_and(i < max_iters, ~jnp.all(done))

    def body(state):
        i, theta_acc, lo, hi, theta, done, counts = state
        lo = jnp.where(jnp.logical_or(done, theta >= 0), lo, theta)
        hi = jnp.where(jnp.logical_or(done, theta >= 0), theta, hi)
        k = jr.fold_in(k_theta, i + 1)
        theta_new = lo + (hi - lo) * jr.uniform(k, (n,), q.dtype)
        theta = jnp.where(done, theta, theta_new)
        ok = ll_theta(theta) > log_y
        accept_now = jnp.logical_and(~done, ok)
        theta_acc = jnp.where(accept_now, theta, theta_acc)
        counts = counts + jnp.asarray(~done, counts.dtype)
        return (
            i + 1, theta_acc, lo, hi, theta,
            jnp.logical_or(done, ok), counts,
        )

    counts0 = jnp.zeros((n,), jnp.int32)
    _, theta_acc, _, _, _, done, n_iters = lax.while_loop(
        cond,
        body,
        (jnp.asarray(0), theta0, lo0, hi0, theta0, done0, counts0),
    )
    q_new = mean + c * jnp.cos(theta_acc) + nu * jnp.sin(theta_acc)
    q_new = jnp.where(done[None, :], q_new, q)
    return q_new, n_iters


def ess_sweep_gauss_cols(
    q0,
    seed: int,
    *,
    n_steps: int,
    chol_prior,
    y,
    prec=1.0,
    mean=0.0,
    max_iters: int = 64,
    collect: bool = False,
    rng_impl: str | None = None,
):
    """``n_steps`` Gaussian-likelihood ESS transitions in one ``lax.scan``
    (the fast path of :func:`ess_sweep_cols`; same key discipline, so the
    two produce the same chains for the matching likelihood — with the
    default PRNG; ``rng_impl="rbg"`` trades that reproducibility for
    ~1.3x faster bulk draws)."""
    q0 = jnp.asarray(q0, jnp.float32)
    root = (
        jr.key(seed ^ 0xE5517, impl=rng_impl)
        if rng_impl
        else jr.key(seed ^ 0xE5517)
    )

    def step(q, i):
        q, _ = ess_transition_gauss_cols(
            q,
            jr.fold_in(root, i),
            chol_prior=chol_prior,
            y=y,
            prec=prec,
            mean=mean,
            max_iters=max_iters,
        )
        return q, (q if collect else None)

    q, draws = lax.scan(step, q0, jnp.arange(n_steps))
    return q, draws


# ----------------------------------------------------------------------
# Pallas VMEM-fused Gaussian-ESS kernel
# ----------------------------------------------------------------------
#
# The XLA fast path above still round-trips the ellipse draw through HBM
# every transition: z is materialized, read by the chol matmul, nu is
# materialized, read by the coefficient pass and the final update —
# ~32 MB of the measured 77 MB/transition at D=256 x 8192 chains. The
# Mosaic kernel keeps z, nu, and the six coefficient rows VMEM-resident
# for a whole sweep: HBM traffic collapses to reading/writing the chain
# block once. Same sampler; its own in-kernel PRNG stream (so chains are
# NOT bit-identical to the XLA path — validated statistically, like the
# pallas HMC kernel).

import functools as _functools

import jax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

try:  # pallas TPU backend is unavailable on CPU builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _ess_gauss_kernel(
    seed_ref,
    q_ref,
    chol_ref,
    y_ref,
    prec_ref,
    mean_ref,
    out_ref,
    *,
    n_steps: int,
    max_iters: int,
    hw_rng: bool,
):
    from .hmc import (
        _hw_rand_bits,
        _normal,
        _sw_rand_bits_factory,
        _uniform_01,
    )

    if hw_rng:
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x3504F333)
        )
        rand_bits = _hw_rand_bits
    else:
        rand_bits = _sw_rand_bits_factory(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x3504F333)
        )

    q0 = q_ref[:]  # (D, NB)
    d, nb = q0.shape
    chol = chol_ref[:]  # (D, D)
    y = y_ref[:]  # (D, 1)
    prec = prec_ref[:]
    mean = mean_ref[:]
    r0 = mean - y
    f_coef = jnp.sum(prec * r0 * r0)
    salt_stride = 8 + max_iters

    def step(i, q):
        salt = i * salt_stride
        z = _normal(rand_bits, (d, nb), salt)
        nu = jnp.dot(chol, z, preferred_element_type=jnp.float32)
        c = q - mean
        a_c = jnp.sum(prec * c * c, axis=0, keepdims=True)  # (1, NB)
        b_c = jnp.sum(prec * nu * nu, axis=0, keepdims=True)
        cc = jnp.sum(prec * c * nu, axis=0, keepdims=True)
        dc = jnp.sum(prec * c * r0, axis=0, keepdims=True)
        e_c = jnp.sum(prec * nu * r0, axis=0, keepdims=True)

        def ll_theta(theta):
            ct, st = jnp.cos(theta), jnp.sin(theta)
            return -0.5 * (
                a_c * ct * ct
                + b_c * st * st
                + 2.0 * cc * ct * st
                + 2.0 * dc * ct
                + 2.0 * e_c * st
                + f_coef
            )

        u = _uniform_01(rand_bits, (1, nb), salt + 4)
        log_y = -0.5 * (a_c + 2.0 * dc + f_coef) + jnp.log(u)
        theta0 = _uniform_01(rand_bits, (1, nb), salt + 5) * _TWO_PI
        # ALL shrink uniforms in one bulk draw (the per-iteration PRNG
        # call latency dominated the fixed loop at small row shapes)
        u_all = _uniform_01(rand_bits, (max_iters, nb), salt + 6)
        # done carried as an f32 0/1 mask: Mosaic loop carries must be
        # vector-register types (i1 rows fail to legalize)
        done0 = (ll_theta(theta0) > log_y).astype(jnp.float32)

        # STATICALLY-UNROLLED shrink loop (Mosaic legalizes neither a
        # dynamic while_loop nor value dynamic_slice in-kernel; max_iters
        # is a Python constant, and each unrolled iteration is a handful
        # of (1, NB) VPU row ops with a static row of the bulk uniform
        # draw — negligible next to the (D, NB) matmul)
        lo, hi = theta0 - _TWO_PI, theta0
        th = theta0
        th_acc = theta0
        done = done0
        for j in range(max_iters):
            is_done = done > 0.5
            keep = jnp.logical_or(is_done, th >= 0)
            lo = jnp.where(keep, lo, th)
            hi = jnp.where(keep, th, hi)
            u_j = u_all[j : j + 1, :]
            th_new = lo + (hi - lo) * u_j
            th = jnp.where(is_done, th, th_new)
            ok = ll_theta(th) > log_y
            acc_now = jnp.logical_and(~is_done, ok)
            th_acc = jnp.where(acc_now, th, th_acc)
            done = jnp.maximum(done, ok.astype(jnp.float32))
        q_new = mean + c * jnp.cos(th_acc) + nu * jnp.sin(th_acc)
        return jnp.where(done > 0.5, q_new, q)

    out_ref[:] = lax.fori_loop(0, n_steps, step, q0)


def ess_sweep_gauss_pallas(
    q0,
    seed: int,
    *,
    n_steps: int,
    chol_prior,
    y,
    prec=1.0,
    mean=0.0,
    max_iters: int = 24,
    block_n: int | None = None,
    interpret: bool = False,
):
    """:func:`ess_sweep_gauss_cols` as a VMEM-resident Mosaic kernel.

    The ellipse draw, its chol matmul, the six coefficient rows, and the
    shrink loop all stay in VMEM for the whole sweep — per sweep the
    chain block touches HBM exactly twice (read q0, write q). In-kernel
    PRNG (hardware on TPU, the counter-based software generator under
    ``interpret=True`` for CI), so draws are not bit-identical to the
    XLA path; validated against the same conjugate closed forms.

    Mosaic constraints shape the kernel: no dynamic while_loop and no
    value dynamic_slice lower in-kernel, so the shrink loop is STATICALLY
    UNROLLED to ``max_iters`` predicated iterations (the XLA path's
    while_loop exits at the realized per-transition max instead). The
    default cap 24 covers the observed shrink tail (max 21 over 8192
    chains on the GP bench target, mean ~6); capped chains keep their
    point (exact no-op, as in the XLA path's cap 64).

    Measured (v5e, D=256 x 8192 chains, 50-step sweeps, >=2 s windows):
    61M transitions/s at the default cap vs the XLA fast path's 58M
    (1.05x); 70M (1.20x) at cap 16, which truncates ~1% of shrinks.
    The modest margin over XLA despite eliminating ~30 of its 77
    MB/transition of HBM traffic shows the workload is compute-side of
    its nominal bytes-accessed roofline — the same overcount the bench's
    roofline lines flag (ARCHITECTURE §Performance measurement).

    Returns ``q`` of shape ``(D, N)``.
    """
    q0 = jnp.asarray(q0, jnp.float32)
    d, n = q0.shape
    chol_prior = jnp.asarray(chol_prior, jnp.float32)
    if chol_prior.ndim < 2:
        # scalar or (D,) std-devs -> diagonal factor
        chol_prior = (
            jnp.reshape(chol_prior, (-1, 1))
            if chol_prior.ndim == 1
            else jnp.full((d, 1), chol_prior, jnp.float32)
        ) * jnp.eye(d, dtype=jnp.float32)
    y = jnp.asarray(y, jnp.float32).reshape(d, 1)
    prec = jnp.broadcast_to(
        jnp.asarray(prec, jnp.float32).reshape(-1, 1), (d, 1)
    )
    mean = jnp.broadcast_to(
        jnp.asarray(mean, jnp.float32).reshape(-1, 1)
        if jnp.ndim(mean) > 0
        else jnp.full((d, 1), mean, jnp.float32),
        (d, 1),
    )

    if block_n is None:
        # VMEM budget: ~6 live (D, NB) f32 buffers + the (D, D) factor
        budget = 8 * 1024 * 1024
        block_n = min(2048, n, max(128, budget // (6 * 4 * max(d, 1))))
        block_n = max(128, (block_n // 128) * 128)
        block_n = min(block_n, n)
        while n % block_n and block_n > 128:
            block_n -= 128
    if n % block_n:
        raise ValueError(
            f"n_chains={n} must be divisible by block_n={block_n} "
            "(pad the chain count or pass block_n explicitly)"
        )
    grid = (n // block_n,)

    kernel = _functools.partial(
        _ess_gauss_kernel,
        n_steps=n_steps,
        max_iters=max_iters,
        hw_rng=not interpret,
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )

    def col_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec(
                memory_space=pltpu.SMEM,
                index_map=lambda i: (0,),
                block_shape=(1,),
            ),
            pl.BlockSpec(
                (d, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            col_spec((d, d)),
            col_spec((d, 1)),
            col_spec((d, 1)),
            col_spec((d, 1)),
        ],
        out_specs=pl.BlockSpec(
            (d, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, n), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        q0,
        chol_prior,
        y,
        prec,
        mean,
    )
