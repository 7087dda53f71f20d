"""Chronopoulos-Gear single-reduction CG: ONE band sweep per iteration.

The standard pipelined kernel (pallas_cg_pipe) needs two phases per CG
iteration because alpha = <r,r>/<p,Mp> must complete before the axpy.
The Chronopoulos-Gear recurrence removes that dependency:

    gamma_i = <r_i, r_i>,  delta_i = <w_i, r_i>,  w_i = M r_i
    beta_i  = gamma_i / gamma_{i-1}                     (0 at i=0)
    alpha_i = gamma_i / (delta_i - beta_i gamma_i / alpha_{i-1})
                                                        (gamma/delta at i=0)
    p_i = r_i + beta_i p_{i-1};   s_i = w_i + beta_i s_{i-1}   (s = M p)
    x_{i+1} = x_i + alpha_i p_i;  r_{i+1} = r_i - alpha_i s_i
    w_{i+1} = M r_{i+1}

so every vector update AND the matvec AND both dot products happen in one
streaming pass: within a band, s/r are recomputed elementwise on the full
halo'd block, which makes r_{i+1} available in the ring rows for the
stencil of w_{i+1} without any extra communication. Per iteration this
moves the same bytes as the two-phase kernel (the F fields dominate and
are read once either way) but halves the per-phase fixed costs (DMA
pipeline ramps, scalar syncs) — and there is a single reduction point.

Numerics: the alpha recurrence reorders rounding vs standard CG (it is
the classic s-step/pipelined-CG trade), so this variant is OPT-IN via
``SolverConfig.pallas_cg_variant = "cgs"``; parity with standard CG is
tested at a few-iteration horizon plus bounded drift at a cap.

Iteration 0 is the same in-kernel prologue as
``pallas_cg_pipe.cg_pallas_pipelined_fromop`` (r0 = rhs - M x0 built from
the QB fields + KT^T z0s) extended with the CG-CG warm-up quantities
w0 = M r0, gamma0, delta0 — the ring (8 rows) covers the composed stencil
depth (4).

Reference analog: one hot loop, devicecalls.cu:229-279 (plain CG); this
is the TPU-native scheduling of the same math.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_cg as _pcg
from .pallas_cg import (
    RING, P11, P12, P13, P22, P23, P33,
    _shift, _tilesum, geometry, pad_field, unpad_field,
)
from .pallas_cg_pipe import KTW, MB, _unpack_masks, stack_fields_packed

# Rows of the stacked state T. (r, w, s) ping-pong between two row sets
# by iteration parity: a band's halo read needs the PREVIOUS iteration's
# values in rows its upstream neighbour has already rewritten this
# iteration — double-buffering the swept vectors removes the RAW hazard
# (x and p are updated interior-only, no halo reads, so they stay
# in-place).
TX, TP = 0, 1
TRWS0, TRWS1 = 2, 5  # [r, w, s] row triples
# SMEM scalar slots.
S_GOLD, S_GAMMA, S_DELTA, S_AOLD, S_ACT, S_BETA, S_ALPHA = range(7)


def _matvec_band(v, f, lam: float, sf: int, th: int):
    """w = M v on a TB-row halo'd band; valid on the interior TH rows."""
    fwd_x, bwd_x, fwd_y, bwd_y = _unpack_masks(f[MB])
    g = fwd_x * (_shift(v, 0, 1) - v) + bwd_x * (v - _shift(v, 0, -1))
    h = fwd_y * (_shift(v, 1, 0) - v) + bwd_y * (v - _shift(v, -1, 0))
    t1 = f[P11] * g + f[P12] * h - f[P13] * v
    t2 = f[P12] * g + f[P22] * h - f[P23] * v
    t3 = f[P13] * g + f[P23] * h - f[P33] * v
    f1 = fwd_x * t1
    b1 = bwd_x * t1
    dxt = _shift(f1, 0, -1) - f1 + b1 - _shift(b1, 0, 1)
    f2 = fwd_y * t2
    b2 = bwd_y * t2
    dyt = _shift(f2, -1, 0) - f2 + b2 - _shift(b2, 1, 0)
    vin = v[RING:RING + th, :]
    ktt = f[KTW, RING:RING + th, :] * _tilesum(vin, sf)
    return ktt + lam * (dxt + dyt - t3)[RING:RING + th, :]


def _kernel(consts_ref, T_hbm, F_hbm, R0_hbm, T_out, iters_ref, r1_ref,
            scal, *, lam: float, sf: int, n_bands: int, th: int):
    TH = th
    lane = pl.program_id(0)
    it = pl.program_id(1)
    tol_sq = consts_ref[lane, 0]
    max_iter = consts_ref[lane, 1]
    wp = T_out.shape[-1]
    TB = TH + 2 * RING

    # ------------- iteration 0: r0, w0, gamma0, delta0 -------------
    @pl.when(it == 0)
    def _():
        scal[0, S_GOLD] = 1.0
        scal[0, S_AOLD] = 1.0
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0

        def body(x_bufs, f_bufs, q_bufs, rw_bufs, in_sems, out_sems):
            def start_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, TX, pl.ds(b * TH, TB), :],
                    x_bufs.at[slot], in_sems.at[slot, 0]).start()
                pltpu.make_async_copy(
                    F_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    f_bufs.at[slot], in_sems.at[slot, 1]).start()
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_bufs.at[slot], in_sems.at[slot, 2]).start()

            def wait_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, TX, pl.ds(b * TH, TB), :],
                    x_bufs.at[slot], in_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    F_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    f_bufs.at[slot], in_sems.at[slot, 1]).wait()
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_bufs.at[slot], in_sems.at[slot, 2]).wait()

            def wait_out(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    rw_bufs.at[slot],
                    T_out.at[lane, pl.ds(TRWS0, 2),
                             pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot]).wait()

            start_in(0)

            def loop(b, acc):
                gamma, delta = acc
                slot = lax.rem(b, 2)

                @pl.when(b + 1 < n_bands)
                def _():
                    start_in(b + 1)

                wait_in(b)
                x = x_bufs[slot]
                f = f_bufs.at[slot]
                fwd_x, bwd_x, fwd_y, bwd_y = _unpack_masks(f[MB])
                # r0 on the FULL band (valid rows 4..TB-4; the interior
                # needs only +-2 of that validity for w0's stencil).
                g = fwd_x * (_shift(x, 0, 1) - x) + bwd_x * (x - _shift(x, 0, -1))
                h = fwd_y * (_shift(x, 1, 0) - x) + bwd_y * (x - _shift(x, -1, 0))
                t1 = f[P11] * g + f[P12] * h - f[P13] * x
                t2 = f[P12] * g + f[P22] * h - f[P23] * x
                t3 = f[P13] * g + f[P23] * h - f[P33] * x
                f1 = fwd_x * t1
                b1 = bwd_x * t1
                dxt = _shift(f1, 0, -1) - f1 + b1 - _shift(b1, 0, 1)
                f2 = fwd_y * t2
                b2 = bwd_y * t2
                dyt = _shift(f2, -1, 0) - f2 + b2 - _shift(b2, 1, 0)
                # KT^T KT x on the full band: ktw rows and tilesum are
                # per-sf-tile local, and TB rows are sf-aligned (RING=8).
                w_full = (f[KTW] * _tilesum(x, sf)
                          + lam * (dxt + dyt - t3))
                q = q_bufs.at[slot]
                q1 = fwd_x * q[0]
                q1b = bwd_x * q[0]
                dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
                q2 = fwd_y * q[1]
                q2b = bwd_y * q[1]
                dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
                rhs_full = q[3] + lam * (dxq + dyq - q[2])
                r0_full = rhs_full - w_full
                w0 = _matvec_band(r0_full, f, lam, sf, TH)
                r0 = r0_full[RING:RING + TH, :]

                @pl.when(b >= 2)
                def _():
                    wait_out(b - 2)

                rw_bufs[slot, 0] = r0
                rw_bufs[slot, 1] = w0
                pltpu.make_async_copy(
                    rw_bufs.at[slot],
                    T_out.at[lane, pl.ds(TRWS0, 2),
                             pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot]).start()
                return (gamma + jnp.sum(r0 * r0), delta + jnp.sum(w0 * r0))

            gamma, delta = lax.fori_loop(
                0, n_bands, loop, (jnp.float32(0.0), jnp.float32(0.0)))
            if n_bands >= 2:
                wait_out(n_bands - 2)
            wait_out(n_bands - 1)
            scal[0, S_GAMMA] = gamma
            scal[0, S_DELTA] = delta
            r1_ref[lane, 0] = gamma

        pl.run_scoped(
            body,
            x_bufs=pltpu.VMEM((2, TB, wp), jnp.float32),
            f_bufs=pltpu.VMEM((2, 8, TB, wp), jnp.float32),
            q_bufs=pltpu.VMEM((2, 4, TB, wp), jnp.float32),
            rw_bufs=pltpu.VMEM((2, 2, TH, wp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2, 3)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
        )

    # ------------- iterations >= 1: one fused sweep -------------
    @pl.when(it >= 1)
    def _():
        gamma = scal[0, S_GAMMA]
        active = jnp.where(
            (gamma > tol_sq) & ((it - 1).astype(jnp.float32) <= max_iter),
            scal[0, S_ACT], 0.0)
        scal[0, S_ACT] = active
        beta = jnp.where(it == 1, 0.0,
                         gamma / jnp.where(scal[0, S_GOLD] == 0.0, 1.0,
                                           scal[0, S_GOLD]))
        delta = scal[0, S_DELTA]
        denom = delta - beta * gamma / scal[0, S_AOLD]
        alpha = gamma / jnp.where(denom == 0.0, 1.0, denom)
        scal[0, S_BETA] = beta
        scal[0, S_ALPHA] = alpha

        @pl.when(active > 0.0)
        def _():
            iters_ref[lane, 0] += 1.0

    active = (scal[0, S_ACT] > 0.0) & (it >= 1)
    rws_src = TRWS0 + 3 * lax.rem(it + 1, 2)  # it=1 -> set 0
    rws_dst = TRWS0 + 3 * lax.rem(it, 2)      # it=1 -> set 1

    @pl.when(active)
    def _():
        def body(rws_bufs, xp_bufs, f_bufs, o_bufs, in_sems, out_sems):
            def start_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, pl.ds(rws_src, 3), pl.ds(b * TH, TB), :],
                    rws_bufs.at[slot], in_sems.at[slot, 0]).start()
                pltpu.make_async_copy(
                    T_out.at[lane, pl.ds(TX, 2), pl.ds(b * TH + RING, TH), :],
                    xp_bufs.at[slot], in_sems.at[slot, 1]).start()
                pltpu.make_async_copy(
                    F_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    f_bufs.at[slot], in_sems.at[slot, 2]).start()

            def wait_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, pl.ds(rws_src, 3), pl.ds(b * TH, TB), :],
                    rws_bufs.at[slot], in_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    T_out.at[lane, pl.ds(TX, 2), pl.ds(b * TH + RING, TH), :],
                    xp_bufs.at[slot], in_sems.at[slot, 1]).wait()
                pltpu.make_async_copy(
                    F_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    f_bufs.at[slot], in_sems.at[slot, 2]).wait()

            def wait_out(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    o_bufs.at[slot, pl.ds(0, 2)],
                    T_out.at[lane, pl.ds(TX, 2), pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    o_bufs.at[slot, pl.ds(2, 3)],
                    T_out.at[lane, pl.ds(rws_dst, 3),
                             pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 1]).wait()

            start_in(0)
            beta = scal[0, S_BETA]
            alpha = scal[0, S_ALPHA]

            def loop(b, acc):
                gamma, delta = acc
                slot = lax.rem(b, 2)

                @pl.when(b + 1 < n_bands)
                def _():
                    start_in(b + 1)

                wait_in(b)
                r = rws_bufs[slot, 0]   # TB rows
                w = rws_bufs[slot, 1]   # TB rows
                s = rws_bufs[slot, 2]   # TB rows
                x = xp_bufs[slot, 0]    # TH rows
                p = xp_bufs[slot, 1]    # TH rows
                f = f_bufs.at[slot]
                s_new = w + beta * s                       # TB (halo exact)
                r_new = r - alpha * s_new                  # TB (halo exact)
                p_new = r[RING:RING + TH, :] + beta * p    # TH
                x_new = x + alpha * p_new                  # TH
                w_new = _matvec_band(r_new, f, lam, sf, TH)
                r_in = r_new[RING:RING + TH, :]

                @pl.when(b >= 2)
                def _():
                    wait_out(b - 2)

                o_bufs[slot, 0] = x_new
                o_bufs[slot, 1] = p_new
                o_bufs[slot, 2] = r_in
                o_bufs[slot, 3] = w_new
                o_bufs[slot, 4] = s_new[RING:RING + TH, :]
                pltpu.make_async_copy(
                    o_bufs.at[slot, pl.ds(0, 2)],
                    T_out.at[lane, pl.ds(TX, 2), pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 0]).start()
                pltpu.make_async_copy(
                    o_bufs.at[slot, pl.ds(2, 3)],
                    T_out.at[lane, pl.ds(rws_dst, 3),
                             pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 1]).start()
                return (gamma + jnp.sum(r_in * r_in),
                        delta + jnp.sum(w_new * r_in))

            gamma, delta = lax.fori_loop(
                0, n_bands, loop, (jnp.float32(0.0), jnp.float32(0.0)))
            if n_bands >= 2:
                wait_out(n_bands - 2)
            wait_out(n_bands - 1)
            scal[0, S_GOLD] = scal[0, S_GAMMA]
            scal[0, S_AOLD] = scal[0, S_ALPHA]
            scal[0, S_GAMMA] = gamma
            scal[0, S_DELTA] = delta
            r1_ref[lane, 0] = gamma

        pl.run_scoped(
            body,
            rws_bufs=pltpu.VMEM((2, 3, TB, wp), jnp.float32),
            xp_bufs=pltpu.VMEM((2, 2, TH, wp), jnp.float32),
            f_bufs=pltpu.VMEM((2, 8, TB, wp), jnp.float32),
            o_bufs=pltpu.VMEM((2, 5, TH, wp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2, 3)),
            out_sems=pltpu.SemaphoreType.DMA((2, 2)),
        )


def _vmem_rows_per_width_cgs(th: int) -> int:
    """f32 VMEM rows per unit padded width: max of the two scoped blocks —
    the iteration sweep 2*(11*TB + 7*TH) and the iteration-0 prologue
    2*(13*TB + 2*TH) (x + 8 F + 4 R0 at TB, r/w out at TH), which is the
    larger one at small th."""
    tb = th + 2 * RING
    return max(2 * (11 * tb + 7 * th), 2 * (13 * tb + 2 * th))


def pick_th_cgs(h: int, w: int, vmem_budget: int = 28 << 20):
    wp = -(-w // 128) * 128
    for th in (64, 32, 16, 8):
        if th > max(8, -(-h // 8) * 8):
            continue
        if _vmem_rows_per_width_cgs(th) * wp * 4 <= vmem_budget:
            return th
    return None


def supported_cgs(h: int, w: int, sf: int) -> bool:
    import jax

    if not _pcg.INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    if sf not in (1, 2, 4):
        return False
    return pick_th_cgs(h, w) is not None


def cg_pallas_cgs_batched(
    x0, op, gm, ktw, z0t, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lane-batched single-launch Chronopoulos-Gear CG (in-kernel r0).

    Same contract as ``cg_pallas_pipelined_fromop_batched``; opt-in perf
    mode (different rounding than standard CG)."""
    B, h, w = x0.shape
    if sf not in (1, 2, 4):
        raise ValueError(f"unsupported sf: {sf}")
    th = pick_th_cgs(h, w)
    if th is None:
        raise ValueError(f"grid too wide for CGS pallas CG: {w}")
    geo = geometry(h, w, th)
    F = jax.vmap(lambda o, g, k: stack_fields_packed(o, g, k, geo))(
        op, gm, ktw)
    R0 = jax.vmap(lambda o, z: jnp.stack(
        [pad_field(r, geo) for r in (o.QB1, o.QB2, o.QB3, z)]))(
            op, jnp.asarray(z0t, jnp.float32))
    zero = jnp.zeros((B,) + geo.shape, jnp.float32)
    # Rows: [x, p, r0, w0, s0, r1, w1, s1] — (r, w, s) double-buffered by
    # iteration parity (see the RAW-hazard note at the top).
    T = jnp.stack([
        jax.vmap(lambda a: pad_field(a, geo))(jnp.asarray(x0, jnp.float32)),
        zero, zero, zero, zero, zero, zero, zero,
    ], axis=1)
    consts = jnp.stack([
        jnp.full((B,), jnp.float32(tol) ** 2),
        jnp.full((B,), jnp.float32(max_iter)),
    ], axis=1)

    kernel = functools.partial(_kernel, lam=lam, sf=sf,
                               n_bands=geo.n_bands, th=geo.th)
    T_new, iters, r1, _scal = pl.pallas_call(
        kernel,
        grid=(B, max_iter + 2, 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(T.shape, T.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=40 << 20),
        interpret=_pcg.INTERPRET,
    )(consts, T, F, R0)
    x = jax.vmap(lambda a: unpad_field(a, geo))(T_new[:, TX])
    return x, iters[:, 0].astype(jnp.int32), r1[:, 0]


def cg_pallas_cgs(
    x0, op, gm, ktw, z0t, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-problem wrapper over the CGS variant."""
    add_b = lambda a: jnp.asarray(a)[None]
    x, iters, r1 = cg_pallas_cgs_batched(
        add_b(x0),
        jax.tree_util.tree_map(add_b, op),
        jax.tree_util.tree_map(add_b, gm),
        add_b(ktw), add_b(z0t), sf=sf, lam=lam, tol=tol, max_iter=max_iter)
    return x[0], iters[0], r1[0]
