"""Fused HMC sweep as a single Pallas TPU kernel.

Motivation (measured on TPU v5e, 64k chains, 11-dim model): under XLA each
leapfrog step round-trips the chain state through HBM, holding HMC at <1%%
of peak FLOPs. This kernel keeps a block of chains resident in VMEM for the
*entire* sweep (momentum refresh → L leapfrogs → MH accept, ×n_steps), so
HBM traffic is one load + one store of the state per sweep regardless of
``n_steps``.

Layout: positions are stored **column-major over chains** — shape ``(D,
N)`` with chains on the lane (last) axis — so every per-chain scalar
(log-density, accept test) is a lane vector and every parameter row is a
sublane. ``D`` is padded to the fp32 sublane tile (8).

The log-density is supplied as a *batched column function*
``logdensity_cols(q: (D, NB)) -> (NB,)`` in plain jnp; its gradient is
taken with ``jax.grad`` inside the kernel and lowers to Mosaic with
everything else.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


_TWO_PI = 6.283185307179586


def _hw_rand_bits(shape, _salt):
    """Raw bits from the per-core TPU hardware PRNG (stateful; the salt is
    unused — stream position advances per call)."""
    return pltpu.prng_random_bits(shape)


def _sw_rand_bits_factory(base):
    """Counter-based software PRNG for interpret mode, where the TPU
    hardware PRNG primitives have no CPU lowering: bits are a pure function
    of (seed, grid position, call salt, element coordinates) through two
    murmur3 finalizer rounds. Statistical quality is adequate for the MH
    accept/momentum draws the kernel makes (validated by the
    posterior-recovery tests in tests/kernels/)."""
    base_u = base.astype(jnp.uint32)

    def rand_bits(shape, salt):
        salt_u = jnp.asarray(salt).astype(jnp.uint32)
        if len(shape) == 2:
            r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        else:
            r = jnp.zeros(shape, jnp.uint32)
            c = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        x = base_u ^ (salt_u * jnp.uint32(0x9E3779B1))
        x = x + r * jnp.uint32(0x85EBCA77) + c * jnp.uint32(0xC2B2AE3D)
        for _ in range(2):  # murmur3 fmix32
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
        return x

    return rand_bits


def _uniform_01(rand_bits, shape, salt):
    """Uniform in (0, 1) from raw PRNG bits: use the top 24 bits.
    (Mosaic has no uint32→f32 cast; the 24-bit value is sign-safe in
    int32, so bitcast first.)"""
    bits = rand_bits(shape, salt)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    hi24 = jax.lax.bitcast_convert_type(bits >> 8, jnp.int32)
    return hi24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal(rand_bits, shape, salt):
    """Standard normals via Box–Muller on PRNG bits."""
    u1 = _uniform_01(rand_bits, shape, salt)
    u2 = _uniform_01(rand_bits, shape, salt + 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _hmc_kernel(
    seed_ref,
    q_ref,
    inv_mass_ref,
    *rest_refs,
    logdensity_cols: Callable,
    n_steps: int,
    L: int,
    eps: float,
    hw_rng: bool,
):
    *const_refs, out_q_ref, accept_ref = rest_refs
    if hw_rng:
        # non-additive block mixing: seed + i would make block i of seed s
        # bit-identical to block i-1 of seed s+1, correlating replicate
        # sweeps run with adjacent seeds (same constant as the sw path)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(0x3504F333))
        rand_bits = _hw_rand_bits
    else:
        rand_bits = _sw_rand_bits_factory(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x3504F333)
        )
    accept_ref[...] = jnp.zeros_like(accept_ref)
    q0 = q_ref[:]  # (D, NB)
    shape = q0.shape
    inv_mass = inv_mass_ref[:]  # (D, 1), broadcasts over the lane axis
    mom_std = jnp.sqrt(1.0 / inv_mass)
    consts = [ref[:] for ref in const_refs]

    def lp_g(q):
        # per-chain log-density and its gradient in one fwd+bwd pass.
        # lp is kept (1, NB): Mosaic rejects rank-1 f32 loop carries
        # (layout_rank check), and a row vector is the native VPU shape
        lp, pullback = jax.vjp(lambda qq: logdensity_cols(qq, *consts), q)
        (g,) = pullback(jnp.ones_like(lp))
        return lp[None, :], g

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p * p, axis=0, keepdims=True)

    def mh_step(i, carry):
        q, lp, g = carry
        salt = i * 4
        p = mom_std * _normal(rand_bits, shape, salt)
        ke0 = kinetic(p)

        # leapfrog with the carried gradient: L evaluations per MH step
        def leap(_, c):
            q, p, g, lp = c
            p = p + (eps / 2.0) * g
            q = q + eps * inv_mass * p
            lp, g = lp_g(q)
            p = p + (eps / 2.0) * g
            return (q, p, g, lp)

        q_new, p_new, g_new, lp_new = jax.lax.fori_loop(
            0, L, leap, (q, p, g, lp)
        )

        log_alpha = (lp_new - kinetic(p_new)) - (lp - ke0)  # (1, NB)
        u = _uniform_01(rand_bits, (1, shape[1]), salt + 2)
        accept = jnp.log(u) < log_alpha  # (1, NB)
        q = jnp.where(accept, q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        g = jnp.where(accept, g_new, g)
        accept_ref[...] += accept.astype(jnp.float32)
        return (q, lp, g)

    lp0, g0 = lp_g(q0)
    q_final, _, _ = jax.lax.fori_loop(0, n_steps, mh_step, (q0, lp0, g0))
    out_q_ref[:] = q_final


_MXU_PRIMS = frozenset({"dot_general", "conv_general_dilated"})

# Primitives the Mosaic kernel path is known-good for (auto-routing is a
# WHITELIST: anything outside it — gathers, sorts, cumsum, scans, custom
# calls — goes to the XLA twin rather than risking a Mosaic lowering
# failure or a slow in-kernel formulation). Every op here is elementwise
# or a lane/sublane reduction the kernel's (D, NB) layout handles.
_PALLAS_SAFE_PRIMS = frozenset({
    "add", "add_any", "sub", "mul", "div", "neg", "pow", "integer_pow",
    "exp", "log", "log1p", "expm1", "sqrt", "rsqrt", "abs", "sign",
    "tanh", "logistic", "sin", "cos", "erf", "erfc",
    "max", "min", "and", "or", "not", "xor", "select_n",
    "lt", "le", "gt", "ge", "eq", "ne", "is_finite",
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "broadcast_in_dim", "reshape", "squeeze", "convert_element_type",
    "transpose", "stop_gradient", "copy", "pjit",
    "slice",  # static slices only — dynamic_slice/gather are NOT safe
})


def _jaxpr_has_mxu_ops(jaxpr) -> bool:
    """Does the (recursively traversed) jaxpr contain matmul/conv ops?"""
    return any(p in _MXU_PRIMS for p in _jaxpr_prims(jaxpr))


def _jaxpr_prims(jaxpr):
    """All primitive names in ``jaxpr``, recursing into sub-jaxprs."""
    for eqn in jaxpr.eqns:
        yield eqn.primitive.name
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for u in vs:
                inner = getattr(u, "jaxpr", None)
                if inner is not None:
                    yield from _jaxpr_prims(inner)


# Above this dimensionality XLA's scan wins even on elementwise bodies
# (measured v5e @64k chains, long windows: pallas/xla = 1.12x at d=8 but
# 0.74x at d=32, 0.59x at d=64 — the VMEM win is a small-state effect)
_PALLAS_MAX_DIM = 16


def select_hmc_backend(logdensity_cols: Callable, d: int, block_n: int) -> str:
    """Data-driven ``"xla"`` vs ``"pallas"`` choice: stage the log-density
    once and inspect its jaxpr. The Pallas kernel is chosen ONLY for
    small (d ≤ 16) bodies built entirely from whitelisted
    elementwise/reduction primitives on an actual TPU — the regime where
    the VMEM-resident sweep measurably wins (1.12× on iid normals at
    d=8, block 2048; see ``bench.py hmc_pallas_elementwise``). Everything
    else — MXU ops, gathers/sorts/scans, unknown primitives, large
    states, non-TPU platforms — takes the XLA twin, which lowers
    everywhere and wins wherever the MXU is involved."""
    try:
        if jax.devices()[0].platform != "tpu" or d > _PALLAS_MAX_DIM:
            return "xla"
        closed = jax.make_jaxpr(logdensity_cols)(
            jax.ShapeDtypeStruct((d, block_n), jnp.float32)
        )
        prims = set(_jaxpr_prims(closed.jaxpr))
        return "pallas" if prims <= _PALLAS_SAFE_PRIMS else "xla"
    except Exception:
        return "xla"


def pallas_hmc(
    logdensity_cols: Callable,
    q0,
    seed: int,
    *,
    n_steps: int,
    eps: float,
    L: int,
    block_n: int | None = None,
    interpret: bool = False,
    backend: str = "xla",
    inv_mass=None,
):
    """Run ``n_steps`` of MH-adjusted HMC on ``N`` column-layout chains.

    Backends (measured, v5e, 64k chains, multi-second timing windows):

    - ``"xla"`` (default): the column sweep as one jitted ``lax.scan`` —
      XLA's scheduling wins whenever the log-density contains matmuls
      (372M transitions/s on the 11-dim hierarchical regression, ~11× the
      trace-based driver), and on elementwise models beyond d≈16.
    - ``"pallas"``: the VMEM-resident Mosaic kernel — wins on small purely
      elementwise models (1.12× over XLA on d=8 iid normals at block
      2048), loses where the MXU is involved or the state is large. Also
      the only TPU path with in-kernel RNG.
    - ``"auto"``: stage the log-density and pick from its jaxpr
      (``select_hmc_backend``): MXU ops present or d > 16 → xla, small
      purely elementwise on a TPU → pallas.

    ``block_n=None`` picks the measured-optimal chain block (2048 for the
    pallas kernel; the xla path ignores it).

    Args:
        logdensity_cols: batched log-density ``(D, NB) -> (NB,)`` in jnp.
        q0: initial positions, shape ``(D, N)`` float32 (``D`` ideally a
            multiple of 8, ``N`` a multiple of ``block_n``).
        seed: int32 PRNG seed (per-block streams are derived from it).

    Returns:
        ``(q_final, accept_rate)`` — positions ``(D, N)`` and the mean
        acceptance rate over chains and steps.
    """
    if backend == "auto":
        backend = select_hmc_backend(
            logdensity_cols, q0.shape[0],
            min(block_n or 1024, q0.shape[1]),
        )
    if backend == "xla":
        # Identical algorithm/layout in plain JAX (block_n is a Pallas
        # tiling knob only — the scan sweep needs no chain blocking).
        return _reference_hmc(
            logdensity_cols, q0, seed, n_steps=n_steps, eps=eps, L=L,
            inv_mass=inv_mass,
        )

    if block_n is None:
        # 2048 is the measured optimum on v5e for small states (1.42B vs
        # 1.14B samples/s at block 1024 on d=8 iid normals), but scoped
        # VMEM scales with d x block x (trajectory carries + VJP
        # residuals): d=16 matmul models already exceed the 16M limit at
        # 2048, so larger states keep 1024. Non-divisible batches take
        # the largest divisor that is still a sane lane tile (>= 128 or
        # the whole batch); a batch with no such divisor must be padded
        # by the caller or given an explicit block_n.
        n_total = q0.shape[1]
        block_n = min(2048 if q0.shape[0] <= 8 else 1024, n_total)
        while n_total % block_n and block_n > 128:
            block_n -= 1
        if n_total % block_n:
            raise ValueError(
                f"n_chains={n_total} has no divisor in [128, 2048] to use "
                "as the Pallas chain block; pad the chain count (powers "
                "of two are ideal) or pass block_n explicitly."
            )

    d, n = q0.shape
    if inv_mass is None:
        inv_mass_col = jnp.ones((d, 1), jnp.float32)
    else:
        inv_mass_col = jnp.reshape(jnp.asarray(inv_mass, jnp.float32), (d, 1))
    assert n % block_n == 0, f"N={n} must be a multiple of block_n={block_n}"
    grid = (n // block_n,)

    # Hoist ALL array constants captured by the log-density closure into
    # explicit kernel inputs (Pallas kernels cannot capture constants, and
    # jax.closure_convert misses numpy-array literals): stage to a jaxpr,
    # take its consts, and replay the jaxpr inside the kernel.
    closed = jax.make_jaxpr(logdensity_cols)(
        jax.ShapeDtypeStruct((d, block_n), jnp.float32)
    )
    raw_consts = closed.consts
    const_shapes = [jnp.shape(c) for c in raw_consts]
    # VMEM wants >=2-D blocks: ship every const as 2-D, restore inside.
    consts = [
        jnp.reshape(jnp.asarray(c), (1, -1)) if jnp.ndim(c) < 2 else jnp.asarray(c)
        for c in raw_consts
    ]

    def converted(q, *flat_consts):
        restored = [
            jnp.reshape(c, shp) if jnp.ndim(c) != len(shp) else c
            for c, shp in zip(flat_consts, const_shapes)
        ]
        (out,) = jax.core.eval_jaxpr(closed.jaxpr, restored, q)
        return out

    kernel = functools.partial(
        _hmc_kernel,
        logdensity_cols=converted,
        n_steps=n_steps,
        L=L,
        eps=eps,
        # interpret mode (CI on CPU) swaps the hardware PRNG for the
        # counter-based software PRNG; the rest of the kernel body is
        # identical
        hw_rng=not interpret,
    )

    def replicated_spec(c):
        return pl.BlockSpec(
            jnp.shape(c),
            lambda i, _nd=jnp.ndim(c): (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    # chain blocks are independent (disjoint output slices, per-block PRNG
    # streams): declare the grid axis parallel so Mosaic may pipeline /
    # distribute blocks instead of the sequential "arbitrary" default
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    q_final, accepts = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec(
                memory_space=pltpu.SMEM, index_map=lambda i: (0,), block_shape=(1,)
            ),
            pl.BlockSpec(
                (d, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *[replicated_spec(c) for c in consts],
        ],
        out_specs=[
            pl.BlockSpec(
                (d, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        q0.astype(jnp.float32),
        inv_mass_col,
        *[jnp.asarray(c) for c in consts],
    )
    accept_rate = jnp.mean(accepts) / n_steps
    return q_final, accept_rate


def _reference_hmc(
    logdensity_cols, q0, seed, *, n_steps, eps, L, inv_mass=None,
    rng_impl: str = "rbg",
):
    """Plain-JAX twin of the kernel (same layout and move structure).

    ``inv_mass``: optional per-dimension inverse mass (≈ posterior variance
    estimate, shape (D,) or (D, 1)). Momenta draw from N(0, M); the drift
    is ``eps * M⁻¹ r``; kinetic energy ``½ rᵀ M⁻¹ r``.

    ``rng_impl``: PRNG implementation for the per-step bit generation. The
    default ``"rbg"`` lowers to the TPU's RngBitGenerator instruction —
    measured 1.31× over threefry on the 64k-chain sweep (354.5 → 464.3M
    samples/s, v5e), since generating (D, N) momenta per step dominates
    threefry's arithmetic. Pass ``"threefry2x32"`` for the JAX default
    stream.
    """
    import jax.random as jr

    d, n = q0.shape
    if inv_mass is None:
        inv_mass = jnp.ones((d, 1), jnp.float32)
    else:
        inv_mass = jnp.reshape(jnp.asarray(inv_mass, jnp.float32), (d, 1))
    mom_std = 1.0 / jnp.sqrt(inv_mass)
    # One vjp per evaluation yields the per-chain log-density primal AND
    # its gradient in a single forward+backward pass; carrying (lp, grad)
    # across MH steps then makes a sweep cost exactly L evaluations per
    # step — the standalone lp0/lp1 passes of the textbook formulation
    # fold away (the cotangent is all-ones because chains are independent:
    # column j of the gradient is d lp[j] / d q[:, j])
    def lp_g(q):
        lp, pullback = jax.vjp(logdensity_cols, q)
        (g,) = pullback(jnp.ones_like(lp))
        return lp, g

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p * p, axis=0)

    def mh_step(carry, key):
        q, lp, g, acc = carry
        kp, ku = jr.split(key)
        p = mom_std * jr.normal(kp, (d, n))
        ke0 = kinetic(p)

        def leap(_, c):
            q, p, g, lp = c
            p = p + (eps / 2.0) * g
            q = q + eps * inv_mass * p
            lp, g = lp_g(q)
            p = p + (eps / 2.0) * g
            return (q, p, g, lp)

        q_new, p_new, g_new, lp_new = jax.lax.fori_loop(
            0, L, leap, (q, p, g, lp)
        )
        log_alpha = (lp_new - kinetic(p_new)) - (lp - ke0)
        accept = jnp.log(jr.uniform(ku, (n,))) < log_alpha
        q = jnp.where(accept[None, :], q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        g = jnp.where(accept[None, :], g_new, g)
        return (q, lp, g, acc + jnp.mean(accept.astype(jnp.float32))), None

    keys = jr.split(jr.key(seed, impl=rng_impl), n_steps)
    q0 = q0.astype(jnp.float32)
    lp0, g0 = lp_g(q0)
    (q, _, _, acc), _ = jax.lax.scan(mh_step, (q0, lp0, g0, 0.0), keys)
    return q, acc / n_steps


def warmup_column(
    logdensity_cols,
    q0,
    seed: int,
    *,
    n_phases: int = 6,
    steps_per_phase: int = 25,
    eps0: float = 0.1,
    L: int = 5,
    target_accept: float = 0.8,
):
    """Windowed warmup for the column layout, on the unified adaptation
    interface (``inference.adaptation``): per phase, run a short HMC sweep,
    nudge the step size toward ``target_accept``, and re-estimate the
    diagonal inverse mass from the CROSS-CHAIN variance (with thousands of
    parallel chains, one time-slice across chains estimates the posterior
    covariance diagonal — no within-chain windows needed).

    The whole schedule compiles to ONE ``lax.scan`` — a single dispatch and
    a single host sync, instead of round-tripping per phase (on the
    high-latency TPU tunnel each sync costs seconds).

    Returns ``(q, eps, inv_mass)`` ready for the main sweep.
    """
    from .adaptation import windowed_warmup

    def sweep(q, idx, eps, inv_mass):
        # phase seeds live on a stream disjoint from any plausible main-
        # sweep seed: seed*1000+idx would make phase 0 of the default
        # seed=0 bit-identical to the main sweep's jr.key(0) stream
        return _reference_hmc(
            logdensity_cols, q, (seed + 1) * 1_000_003 + idx,
            n_steps=steps_per_phase, eps=eps, L=L, inv_mass=inv_mass,
        )

    q, eps, inv_mass, _accs = jax.jit(
        lambda q0: windowed_warmup(
            sweep, q0.astype(jnp.float32),
            n_windows=n_phases, eps0=eps0, target_accept=target_accept,
        )
    )(q0)
    return q, float(eps), inv_mass
