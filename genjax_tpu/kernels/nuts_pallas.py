"""VMEM-resident NUTS sweep as a single Pallas TPU kernel.

Motivation (round-5 measurement, `bench.py nuts` / ARCHITECTURE §round-5
refinement): under XLA, every NUTS leapfrog streams its tree working set
— the while-loop carries (z, r, g, proposal), the checkpoint stack, and
the doubling-merge selects, ~13.6 `(D, N)` passes ≈ 57 MB at 64k chains
— through HBM, which caps the batched NUTS at ~21% of the HMC sweep's
leapfrog rate (the composition bound explains 96.9% of the measured
time, so the remaining headroom is RESIDENCY, not scheduling). This
kernel keeps a block of chains' ENTIRE tree state — endpoints,
proposal, and the O(max_depth) checkpoint stack — resident in VMEM for
the whole sweep, so HBM traffic is one load + one store of the
positions per sweep, exactly like the fused HMC kernel
(``kernels/hmc.py``).

Semantics mirror ``kernels.nuts.nuts_transition_cols`` (same progressive
multinomial sampling, same checkpoint-stack U-turn detector, same
divergence rule, same collective early exit — per chain-block here), so
the two backends sample the same process; agreement is pinned by
``tests/kernels/test_nuts_pallas.py``.

**STATUS: EXPERIMENTAL — interpret-mode only on this toolchain.** The
kernel is semantically complete and validated under the Pallas
interpreter (it cross-checks the XLA NUTS implementation: matching
accept statistics, leapfrog counts, and posterior moments), but the
current Mosaic TPU compiler crashes on the full kernel with an opaque
INTERNAL error (remote compile helper exit 1, no diagnostic). On-chip
bisection (2026-08, v5e, minimized probe kernels): every individual
construct compiles — nested data-dependent ``while`` loops with
13-tuple ``(D, N)`` carries, VMEM scratch stacks with dynamic
slot stores/loads, hardware-PRNG draws inside nested loops, traced-bound
``fori`` U-turn sweeps, outer transition loops, multi-block grids — and
one genuine compiler bug was isolated and worked around (bool rows
carried through a ``while`` and reduced in its condition crash the
compiler; all flags here are f32 0/1 masks with sum-based conditions).
The minimal failing combination is the accept-statistic
accumulator TOGETHER with the divergence test in the leaf body (each
compiles alone; sharing their ``energy0 - energy`` term does not help),
pointing at a capacity cliff in the innermost loop rather than any
single op; it cannot be diagnosed further through the sealed compile
service. Until the
toolchain moves, the XLA twin (``kernels.nuts``) is the production
path; this file preserves the VMEM-residency design — the measured
motivation (the 70 µs/leapfrog tree-traffic bound) stands.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .hmc import _hw_rand_bits, _normal, _sw_rand_bits_factory, _uniform_01


def _popcount32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _nuts_kernel(
    seed_ref,
    q_ref,
    inv_mass_ref,
    *rest_refs,
    logdensity_cols: Callable,
    n_steps: int,
    max_depth: int,
    eps: float,
    divergence_threshold: float,
    hw_rng: bool,
):
    # trailing two refs are the VMEM scratch checkpoint stacks (Mosaic
    # has no lowering for dynamic_update_slice on VALUES; mutable
    # scratch refs with pl.store/pl.load dynamic slices are the
    # supported form of the stack)
    *const_refs, out_q_ref, accept_ref, leaps_ref, ck_z_ref, ck_r_ref = (
        rest_refs
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
    shape = q0.shape
    inv_mass = inv_mass_ref[:]  # (D, 1)
    mom_std = jnp.sqrt(1.0 / inv_mass)
    consts = [ref[:] for ref in const_refs]

    def lp_g(q):
        lp, pullback = jax.vjp(lambda qq: logdensity_cols(qq, *consts), q)
        (g,) = pullback(jnp.ones_like(lp))
        return lp[None, :], g  # (1, NB), (D, NB)

    def kinetic(r):
        return 0.5 * jnp.sum(inv_mass * r * r, axis=0, keepdims=True)

    frow = jnp.zeros((1, nb), jnp.float32)

    # ALL per-chain flags (turning/diverged/done) are carried as f32 0/1
    # masks, never bool: Mosaic's remote compiler crashes (HTTP 500
    # INTERNAL, no diagnostic) on while loops whose carries include bool
    # rows reduced in the condition — bisected on-chip; f32 masks with
    # sum-based conditions lower cleanly. Logic becomes arithmetic:
    # or = maximum, and = product, not = 1 - x.

    def transition(t_idx, carry):
        q, acc_sum, leap_sum, salt = carry
        r0 = mom_std * _normal(rand_bits, shape, salt)
        ld0, g0 = lp_g(q)
        energy0 = -ld0 + kinetic(r0)  # (1, NB)

        # tree state: endpoints (z/r/g +/-), proposal, trajectory weight
        t0 = (
            q, r0, g0, q, r0, g0, q, -energy0,
            frow, frow, frow, frow, frow,
        )

        def build_subtree(t, depth, direction, done, salt):
            (z_m, r_m, g_m, z_p, r_p, g_p, _zpr, _lwt,
             t_turn, t_div, _nl, t_sacc, t_scnt) = t
            n_leaves = jnp.int32(1) << depth
            fwd = direction > 0  # (1, NB) bool temp (not carried)
            z_cur = jnp.where(fwd, z_p, z_m)
            r_cur = jnp.where(fwd, r_p, r_m)
            g_cur = jnp.where(fwd, g_p, g_m)
            e = eps * direction  # (1, NB)

            s0 = (
                z_cur, r_cur, g_cur, z_cur,
                jnp.full((1, nb), -jnp.inf), frow, frow, t_sacc, t_scnt,
            )

            def leaf_cond(carry):
                i, s, _salt = carry
                turning, diverged = s[5], s[6]
                alive = (1.0 - turning) * (1.0 - diverged) * (1.0 - done)
                return jnp.logical_and(i < n_leaves, jnp.sum(alive) > 0.0)

            def leaf_body(carry):
                i, s, salt = carry
                (z, r, g, z_prop, lw_sub, turning, diverged,
                 sacc, scnt) = s
                active = (1.0 - turning) * (1.0 - diverged) * (1.0 - done)
                a_bool = active > 0.5
                r_half = r + 0.5 * e * g
                z_new = z + e * inv_mass * r_half
                ld_new, g_new = lp_g(z_new)
                r_new = r_half + 0.5 * e * g_new

                bc = _popcount32(i)
                ck_z_ref[pl.dslice(bc, 1)] = z_new[None]
                ck_r_ref[pl.dslice(bc, 1)] = r_new[None]

                energy = -ld_new + kinetic(r_new)
                energy = jnp.where(jnp.isnan(energy), jnp.inf, energy)
                lw_leaf = -energy
                div_new = active * jnp.where(
                    energy - energy0 > divergence_threshold, 1.0, 0.0
                )
                lw_new = jnp.where(
                    a_bool, jnp.logaddexp(lw_sub, lw_leaf), lw_sub
                )
                p_take = jnp.exp(lw_leaf - lw_new)
                u = _uniform_01(rand_bits, (1, nb), salt)
                take = jnp.logical_and(a_bool, u < p_take)
                z_prop = jnp.where(take, z_new, z_prop)

                acc = jnp.minimum(1.0, jnp.exp(energy0 - energy))
                sacc = sacc + active * acc
                scnt = scnt + active

                ip1 = i + 1
                ntz1 = _popcount32((ip1 & -ip1) - 1)

                def check(j_off, turning):
                    slot_j = bc - 1 - j_off
                    cz = jnp.reshape(
                        ck_z_ref[pl.dslice(slot_j, 1)], (d, nb)
                    )
                    cr = jnp.reshape(
                        ck_r_ref[pl.dslice(slot_j, 1)], (d, nb)
                    )
                    dz = direction * (z_new - cz)
                    ut = jnp.where(
                        jnp.logical_or(
                            jnp.sum(
                                dz * inv_mass * cr, axis=0, keepdims=True
                            )
                            < 0.0,
                            jnp.sum(
                                dz * inv_mass * r_new,
                                axis=0,
                                keepdims=True,
                            )
                            < 0.0,
                        ),
                        1.0,
                        0.0,
                    )
                    return jnp.maximum(turning, active * ut)

                turning = lax.fori_loop(0, ntz1, check, turning)

                s_new = (
                    jnp.where(a_bool, z_new, z),
                    jnp.where(a_bool, r_new, r),
                    jnp.where(a_bool, g_new, g),
                    z_prop,
                    lw_new,
                    turning,
                    jnp.maximum(diverged, div_new),
                    sacc,
                    scnt,
                )
                return (i + 1, s_new, salt + 4)

            _i, s, salt = lax.while_loop(
                leaf_cond, leaf_body, (jnp.int32(0), s0, salt)
            )
            return s, salt

        def doubling_cond(carry):
            j, _t, done, _salt = carry
            return jnp.logical_and(
                j < max_depth, jnp.sum(done) < float(nb)
            )

        def doubling(carry):
            j, t, done, salt = carry
            u_dir = _uniform_01(rand_bits, (1, nb), salt)
            direction = jnp.where(u_dir < 0.5, -1.0, 1.0)
            salt = salt + 4
            s, salt = build_subtree(t, j, direction, done, salt)
            (s_z, s_r, s_g, s_zprop, s_lw, s_turn, s_div,
             s_sacc, s_scnt) = s
            (z_m, r_m, g_m, z_p, r_p, g_p, z_prop, lw_traj,
             t_turn, t_div, n_leap, _osacc, _oscnt) = t

            sub_ok = (1.0 - s_turn) * (1.0 - s_div)  # f32 mask
            p_acc = jnp.minimum(1.0, jnp.exp(s_lw - lw_traj))
            u = _uniform_01(rand_bits, (1, nb), salt)
            salt = salt + 4
            live = 1.0 - done
            take = jnp.logical_and(
                (live * sub_ok) > 0.5, u < p_acc
            )
            z_prop = jnp.where(take, s_zprop, z_prop)
            grow = live * sub_ok
            g_bool = grow > 0.5
            lw_traj = jnp.where(
                g_bool, jnp.logaddexp(lw_traj, s_lw), lw_traj
            )

            fwd = direction > 0
            upd_f = jnp.logical_and(g_bool, fwd)
            upd_b = jnp.logical_and(g_bool, jnp.logical_not(fwd))
            z_p = jnp.where(upd_f, s_z, z_p)
            r_p = jnp.where(upd_f, s_r, r_p)
            g_p = jnp.where(upd_f, s_g, g_p)
            z_m = jnp.where(upd_b, s_z, z_m)
            r_m = jnp.where(upd_b, s_r, r_m)
            g_m = jnp.where(upd_b, s_g, g_m)

            dz = z_p - z_m
            global_turn = jnp.where(
                jnp.logical_or(
                    jnp.sum(dz * inv_mass * r_m, axis=0, keepdims=True)
                    < 0.0,
                    jnp.sum(dz * inv_mass * r_p, axis=0, keepdims=True)
                    < 0.0,
                ),
                1.0,
                0.0,
            )
            new_done = jnp.maximum(
                done, jnp.maximum(1.0 - sub_ok, global_turn)
            )
            n_leap = n_leap + (1.0 - done) * (
                jnp.int32(1) << j
            ).astype(jnp.float32)
            d_bool = done > 0.5
            t_new = (
                z_m, r_m, g_m, z_p, r_p, g_p, z_prop, lw_traj,
                jnp.maximum(t_turn, s_turn),
                jnp.maximum(t_div, s_div),
                n_leap,
                jnp.where(d_bool, t[11], s_sacc),
                jnp.where(d_bool, t[12], s_scnt),
            )
            return (j + 1, t_new, new_done, salt)

        _j, t, _done, salt = lax.while_loop(
            doubling_cond, doubling, (jnp.int32(0), t0, frow, salt + 4)
        )
        z_prop, sacc, scnt, n_leap = t[6], t[11], t[12], t[10]
        acc_sum = acc_sum + sacc / jnp.maximum(scnt, 1.0)
        leap_sum = leap_sum + n_leap
        return (z_prop, acc_sum, leap_sum, salt + 4)

    q_final, acc_sum, leap_sum, _salt = lax.fori_loop(
        0, n_steps, transition, (q0, frow, frow, jnp.int32(1))
    )
    out_q_ref[:] = q_final
    accept_ref[:] = acc_sum
    leaps_ref[:] = leap_sum


def pallas_nuts(
    logdensity_cols: Callable,
    q0,
    seed: int,
    *,
    n_steps: int,
    eps,
    max_depth: int = 8,
    inv_mass=None,
    block_n: int | None = None,
    interpret: bool = False,
    divergence_threshold: float = 1000.0,
):
    """Run ``n_steps`` NUTS transitions on column-layout chains with the
    whole tree state VMEM-resident (see module docstring). Returns
    ``(q_final, accept_stat, mean_leapfrogs)`` — the same contract as the
    XLA twin ``kernels.nuts.nuts_sweep_cols`` (without ``collect``).
    """
    d, n = q0.shape
    if inv_mass is None:
        inv_mass_col = jnp.ones((d, 1), jnp.float32)
    else:
        inv_mass_col = jnp.reshape(
            jnp.asarray(inv_mass, jnp.float32), (d, 1)
        )
    if block_n is None:
        # the tree state is ~12 (D, NB) arrays + 2 (max_depth+1, D, NB)
        # checkpoint stacks; block 512 keeps it well under the VMEM
        # scope at d<=16, depth<=10
        block_n = min(512, n)
        while n % block_n and block_n > 128:
            block_n -= 1
    if n % block_n:
        raise ValueError(
            f"n_chains={n} has no usable Pallas chain block >= 128; pad "
            "the chain count or pass block_n."
        )
    grid = (n // block_n,)

    closed = jax.make_jaxpr(logdensity_cols)(
        jax.ShapeDtypeStruct((d, block_n), jnp.float32)
    )
    raw_consts = closed.consts
    const_shapes = [jnp.shape(c) for c in raw_consts]
    consts = [
        jnp.reshape(jnp.asarray(c), (1, -1))
        if jnp.ndim(c) < 2
        else jnp.asarray(c)
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
        _nuts_kernel,
        logdensity_cols=converted,
        n_steps=n_steps,
        max_depth=max_depth,
        eps=eps,
        divergence_threshold=divergence_threshold,
        hw_rng=not interpret,
    )

    def replicated_spec(c):
        return pl.BlockSpec(
            jnp.shape(c),
            lambda i, _nd=jnp.ndim(c): (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    q_final, acc, leaps = pl.pallas_call(
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
            pl.BlockSpec(
                (1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_depth + 1, d, block_n), jnp.float32),
            pltpu.VMEM((max_depth + 1, d, block_n), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        q0.astype(jnp.float32),
        inv_mass_col,
        *[jnp.asarray(c) for c in consts],
    )
    accept_stat = jnp.mean(acc) / n_steps
    mean_leaps = jnp.mean(leaps) / n_steps
    return q_final, accept_stat, mean_leaps
