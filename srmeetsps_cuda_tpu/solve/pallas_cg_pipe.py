"""Pipelined single-launch Pallas CG: double-buffered band streaming.

pallas_cg_fused.py issues one grid step per (iteration, phase, band) and
serialises each band's DMAs against its compute. This variant collapses the
band dimension into an in-kernel ``fori_loop`` (grid is just
``(max_iter + 1, 2)``) with TWO VMEM slots per stream: while band b
computes, band b+1's inputs are already in flight, and output DMAs drain in
the background (waited two bands later, before their slot is reused) — the
guide's double-buffering pattern applied to the whole CG loop. The dot
products accumulate in a fori carry (registers), touching SMEM once per
phase.

Numerics are identical to pallas_cg_fused (same per-band arithmetic; the
only reduction-order difference is the pw/rr accumulation, which is the
same band order).

VMEM: 2 slots x (r, p, 8-field packed F, w) at TH=64 is ~9 MB for a
1280-wide image — ``supported()`` gates width. The gradient masks ride as
one int32 bitfield row (stack_fields_packed), cutting input traffic ~23%
vs the unpacked 11-field layout.
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
    _shift, _tilesum, geometry, pad_field, pick_th, unpad_field, make_ktw,
)
from .pallas_cg_fused import TX, TR, TW_, TP0, S_R0, S_R1, S_PW, S_RR, \
    S_ACT, S_BETA, S_ALPHA

# Packed field layout: 7 f32 coefficient rows + one row of gradient-mask
# bits (int32 bit-packed, stored bitcast as f32) — 8 DMA'd rows instead of
# the 11 of the unpacked layout, a ~23% input-traffic cut on a kernel that
# runs at the HBM roofline. With Jacobi preconditioning a 9th row carries
# 1/diag(M) (IVD).
KTW = 6
MB = 7
IVD = 8


def stack_fields_packed(op, gm, ktw, geo, invd=None):
    mb = (gm.fwd_x.astype(jnp.int32)
          | (gm.bwd_x.astype(jnp.int32) << 1)
          | (gm.fwd_y.astype(jnp.int32) << 2)
          | (gm.bwd_y.astype(jnp.int32) << 3))
    mb_f = jax.lax.bitcast_convert_type(mb, jnp.float32)
    rows = [op.P11, op.P12, op.P13, op.P22, op.P23, op.P33, ktw, mb_f]
    if invd is not None:
        rows.append(invd)
    # pad-per-row-then-stack: see stack_fields_rows (avoids re-padding the
    # whole stack every outer iteration; zero-pad of mb_f bitcasts to an
    # all-masks-off int row, same as padding after the stack)
    return jnp.stack([pad_field(r, geo) for r in rows])


def _unpack_masks(mb_f32):
    mb = pltpu.bitcast(mb_f32, jnp.int32)
    f32 = lambda x: x.astype(jnp.float32)
    return (f32(mb & 1), f32((mb >> 1) & 1),
            f32((mb >> 2) & 1), f32((mb >> 3) & 1))


# Extra SMEM slot (beyond pallas_cg_fused's 7): the true squared residual
# when Jacobi-preconditioned (S_R0/S_R1 then hold the rz = <r, P^-1 r>
# recurrence dots, but stopping tests <r, r> — jnp-PCG semantics).
S_RR2 = 7


def _kernel(consts_ref, T_hbm, F_hbm, *rest,
            lam: float, sf: int, n_bands: int, th: int,
            fromop: bool = False, jacobi: bool = False):
    TH = th
    NF = 9 if jacobi else 8
    assert not jacobi or fromop, "jacobi requires the fromop prologue"
    """Grid (B, max_iter+1+off, 2): lanes (batched problems) run
    sequentially on the core; per-lane CG scalar state lives in the SMEM
    workspace and is re-initialised at each lane's first step, so per-lane
    stopping is exact. B=1 is the single-solve case.

    With ``fromop`` (off=1), iteration 0 is a prologue that computes the
    initial residual IN-KERNEL: r0 = [z0t + lam*(Dx' QB1 + Dy' QB2 - QB3)]
    - M x0, streaming the extra R0 fields (QB1, QB2, QB3, KT^T z0s) once —
    this replaces two full jnp passes (rhs + matvec) per outer iteration.
    """
    if fromop:
        R0_hbm, T_out, iters_ref, r1_ref, scal = rest
    else:
        (T_out, iters_ref, r1_ref, scal) = rest
        R0_hbm = None
    off = 1 if fromop else 0
    lane = pl.program_id(0)
    it = pl.program_id(1)
    phase = pl.program_id(2)
    tol_sq = consts_ref[lane, 0]
    r1_init = consts_ref[lane, 1]
    max_iter = consts_ref[lane, 2]
    wp = T_out.shape[-1]
    TB = TH + 2 * RING

    @pl.when((it == 0) & (phase == 0))
    def _():
        scal[0, S_R0] = 0.0
        scal[0, S_R1] = r1_init
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0
        r1_ref[lane, 0] = r1_init

    if fromop:
        # ---- iteration-0 prologue: r = rhs - M x0, r1 = <r, r> ----
        @pl.when((it == 0) & (phase == 0))
        def _():
            def body(x_bufs, f_bufs, q_bufs, r_bufs, in_sems, out_sems):
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
                        r_bufs.at[slot],
                        T_out.at[lane, TR, pl.ds(b * TH + RING, TH), :],
                        out_sems.at[slot]).wait()

                start_in(0)

                def loop(b, acc):
                    slot = lax.rem(b, 2)

                    @pl.when(b + 1 < n_bands)
                    def _():
                        start_in(b + 1)

                    wait_in(b)
                    x = x_bufs[slot]
                    f = f_bufs.at[slot]
                    fwd_x, bwd_x, fwd_y, bwd_y = _unpack_masks(f[MB])
                    # w = M x0 (exact on interior rows: ring 8 >= stencil
                    # depth 2 of grad + adjoint).
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
                    xin = x[RING:RING + TH, :]
                    ktt = f[KTW, RING:RING + TH, :] * _tilesum(xin, sf)
                    w = ktt + lam * (dxt + dyt - t3)[RING:RING + TH, :]
                    # rhs = z0t + lam * (Dx' QB1 + Dy' QB2 - QB3)
                    q = q_bufs.at[slot]
                    q1 = fwd_x * q[0]
                    q1b = bwd_x * q[0]
                    dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
                    q2 = fwd_y * q[1]
                    q2b = bwd_y * q[1]
                    dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
                    rhs = (q[3, RING:RING + TH, :]
                           + lam * (dxq + dyq - q[2])[RING:RING + TH, :])
                    r = rhs - w

                    @pl.when(b >= 2)
                    def _():
                        wait_out(b - 2)

                    r_bufs[slot] = r
                    pltpu.make_async_copy(
                        r_bufs.at[slot],
                        T_out.at[lane, TR, pl.ds(b * TH + RING, TH), :],
                        out_sems.at[slot]).start()
                    rr, rz = acc
                    rr = rr + jnp.sum(r * r)
                    if jacobi:
                        rz = rz + jnp.sum(
                            r * r * f[IVD, RING:RING + TH, :])
                    return (rr, rz)

                rr, rz = lax.fori_loop(
                    0, n_bands, loop, (jnp.float32(0.0), jnp.float32(0.0)))
                if n_bands >= 2:
                    wait_out(n_bands - 2)
                wait_out(n_bands - 1)
                scal[0, S_R1] = rz if jacobi else rr
                if jacobi:
                    scal[0, S_RR2] = rr
                r1_ref[lane, 0] = rr

            pl.run_scoped(
                body,
                x_bufs=pltpu.VMEM((2, TB, wp), jnp.float32),
                f_bufs=pltpu.VMEM((2, NF, TB, wp), jnp.float32),
                q_bufs=pltpu.VMEM((2, 4, TB, wp), jnp.float32),
                r_bufs=pltpu.VMEM((2, TH, wp), jnp.float32),
                in_sems=pltpu.SemaphoreType.DMA((2, 3)),
                out_sems=pltpu.SemaphoreType.DMA((2,)),
            )

    @pl.when((phase == 0) & (it >= off))
    def _():
        r1 = scal[0, S_R1]
        stop_dot = scal[0, S_RR2] if jacobi else r1
        active = jnp.where(
            (stop_dot > tol_sq)
            & ((it - off).astype(jnp.float32) <= max_iter),
            scal[0, S_ACT], 0.0)
        scal[0, S_ACT] = active
        scal[0, S_BETA] = jnp.where(
            it == off, 0.0,
            r1 / jnp.where(scal[0, S_R0] == 0.0, 1.0, scal[0, S_R0]))

        @pl.when(active > 0.0)
        def _():
            iters_ref[lane, 0] += 1.0

    active = (scal[0, S_ACT] > 0.0) & (it >= off)
    p_src = TP0 + lax.rem(it - off + 2, 2)
    p_dst = TP0 + lax.rem(it - off + 3, 2)

    # ---------------- phase 0: p update + matvec + <p, w> ----------------
    @pl.when(active & (phase == 0))
    def _():
        def body(r_bufs, p_bufs, f_bufs, w_bufs, in_sems, out_sems):
            def start_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, TR, pl.ds(b * TH, TB), :], r_bufs.at[slot],
                    in_sems.at[slot, 0]).start()
                pltpu.make_async_copy(
                    T_out.at[lane, p_src, pl.ds(b * TH, TB), :], p_bufs.at[slot],
                    in_sems.at[slot, 1]).start()
                pltpu.make_async_copy(
                    F_hbm.at[lane, :, pl.ds(b * TH, TB), :], f_bufs.at[slot],
                    in_sems.at[slot, 2]).start()

            def wait_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, TR, pl.ds(b * TH, TB), :], r_bufs.at[slot],
                    in_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    T_out.at[lane, p_src, pl.ds(b * TH, TB), :], p_bufs.at[slot],
                    in_sems.at[slot, 1]).wait()
                pltpu.make_async_copy(
                    F_hbm.at[lane, :, pl.ds(b * TH, TB), :], f_bufs.at[slot],
                    in_sems.at[slot, 2]).wait()

            def wait_out(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    p_bufs.at[slot, pl.ds(RING, TH), :],
                    T_out.at[lane, p_dst, pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    w_bufs.at[slot],
                    T_out.at[lane, TW_, pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 1]).wait()

            start_in(0)

            def loop(b, pw):
                slot = lax.rem(b, 2)

                @pl.when(b + 1 < n_bands)
                def _():
                    start_in(b + 1)

                wait_in(b)

                beta = scal[0, S_BETA]
                f = f_bufs.at[slot]
                if jacobi:
                    # z = P^-1 r on the fly — invd rides as a packed row.
                    p = r_bufs[slot] * f[IVD] + beta * p_bufs[slot]
                else:
                    p = r_bufs[slot] + beta * p_bufs[slot]
                fwd_x, bwd_x, fwd_y, bwd_y = _unpack_masks(f[MB])
                g = fwd_x * (_shift(p, 0, 1) - p) + bwd_x * (p - _shift(p, 0, -1))
                h = fwd_y * (_shift(p, 1, 0) - p) + bwd_y * (p - _shift(p, -1, 0))
                t1 = f[P11] * g + f[P12] * h - f[P13] * p
                t2 = f[P12] * g + f[P22] * h - f[P23] * p
                t3 = f[P13] * g + f[P23] * h - f[P33] * p
                f1 = fwd_x * t1
                b1 = bwd_x * t1
                dxt = _shift(f1, 0, -1) - f1 + b1 - _shift(b1, 0, 1)
                f2 = fwd_y * t2
                b2 = bwd_y * t2
                dyt = _shift(f2, -1, 0) - f2 + b2 - _shift(b2, 1, 0)

                pin = p[RING:RING + TH, :]
                ktt = f[KTW, RING:RING + TH, :] * _tilesum(pin, sf)
                w = ktt + lam * (dxt + dyt - t3)[RING:RING + TH, :]

                # Drain this slot's previous output before overwriting.
                @pl.when(b >= 2)
                def _():
                    wait_out(b - 2)

                p_bufs[slot, RING:RING + TH, :] = pin
                w_bufs[slot] = w
                pltpu.make_async_copy(
                    p_bufs.at[slot, pl.ds(RING, TH), :],
                    T_out.at[lane, p_dst, pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 0]).start()
                pltpu.make_async_copy(
                    w_bufs.at[slot],
                    T_out.at[lane, TW_, pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot, 1]).start()
                return pw + jnp.sum(pin * w)

            pw = lax.fori_loop(0, n_bands, loop, jnp.float32(0.0))
            # Drain the tail.
            if n_bands >= 2:
                wait_out(n_bands - 2)
            wait_out(n_bands - 1)
            scal[0, S_PW] = pw

        pl.run_scoped(
            body,
            r_bufs=pltpu.VMEM((2, TB, wp), jnp.float32),
            p_bufs=pltpu.VMEM((2, TB, wp), jnp.float32),
            f_bufs=pltpu.VMEM((2, NF, TB, wp), jnp.float32),
            w_bufs=pltpu.VMEM((2, TH, wp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2, 3)),
            out_sems=pltpu.SemaphoreType.DMA((2, 2)),
        )

    # ---------------- phase 1: axpy + <r, r> ----------------
    @pl.when(phase == 1)
    def _():
        @pl.when(active)
        def _():
            pw = scal[0, S_PW]
            scal[0, S_ALPHA] = scal[0, S_R1] / jnp.where(pw == 0.0, 1.0, pw)

    @pl.when(active & (phase == 1))
    def _():
        def body(s_bufs, p_bufs, i_bufs, in_sems, out_sems):
            def start_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, pl.ds(TX, 3), pl.ds(b * TH + RING, TH), :],
                    s_bufs.at[slot], in_sems.at[slot, 0]).start()
                pltpu.make_async_copy(
                    T_out.at[lane, p_dst, pl.ds(b * TH + RING, TH), :],
                    p_bufs.at[slot], in_sems.at[slot, 1]).start()
                if jacobi:
                    pltpu.make_async_copy(
                        F_hbm.at[lane, IVD, pl.ds(b * TH + RING, TH), :],
                        i_bufs.at[slot], in_sems.at[slot, 2]).start()

            def wait_in(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    T_out.at[lane, pl.ds(TX, 3), pl.ds(b * TH + RING, TH), :],
                    s_bufs.at[slot], in_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    T_out.at[lane, p_dst, pl.ds(b * TH + RING, TH), :],
                    p_bufs.at[slot], in_sems.at[slot, 1]).wait()
                if jacobi:
                    pltpu.make_async_copy(
                        F_hbm.at[lane, IVD, pl.ds(b * TH + RING, TH), :],
                        i_bufs.at[slot], in_sems.at[slot, 2]).wait()

            def wait_out(b):
                slot = lax.rem(b, 2)
                pltpu.make_async_copy(
                    s_bufs.at[slot, pl.ds(TX, 2)],
                    T_out.at[lane, pl.ds(TX, 2), pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot]).wait()

            start_in(0)

            def loop(b, acc):
                rr, rz = acc
                slot = lax.rem(b, 2)

                @pl.when(b + 1 < n_bands)
                def _():
                    start_in(b + 1)

                wait_in(b)
                alpha = scal[0, S_ALPHA]
                x = s_bufs[slot, TX] + alpha * p_bufs[slot]
                r = s_bufs[slot, TR] - alpha * s_bufs[slot, TW_]

                @pl.when(b >= 2)
                def _():
                    wait_out(b - 2)

                s_bufs[slot, TX] = x
                s_bufs[slot, TR] = r
                pltpu.make_async_copy(
                    s_bufs.at[slot, pl.ds(TX, 2)],
                    T_out.at[lane, pl.ds(TX, 2), pl.ds(b * TH + RING, TH), :],
                    out_sems.at[slot]).start()
                rr = rr + jnp.sum(r * r)
                if jacobi:
                    rz = rz + jnp.sum(r * r * i_bufs[slot])
                return (rr, rz)

            rr, rz = lax.fori_loop(
                0, n_bands, loop, (jnp.float32(0.0), jnp.float32(0.0)))
            if n_bands >= 2:
                wait_out(n_bands - 2)
            wait_out(n_bands - 1)
            scal[0, S_RR] = rr
            if jacobi:
                # Park rz in S_PW: it was consumed for alpha before this
                # scoped block, so the slot is free until next phase 0.
                scal[0, S_PW] = rz

        pl.run_scoped(
            body,
            s_bufs=pltpu.VMEM((2, 3, TH, wp), jnp.float32),
            p_bufs=pltpu.VMEM((2, TH, wp), jnp.float32),
            i_bufs=pltpu.VMEM((2, TH, wp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2, 3 if jacobi else 2)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
        )

        # Rotate scalars at end of iteration. With Jacobi, S_R0/S_R1 carry
        # the rz recurrence and S_RR2 the true <r, r> for stopping.
        scal[0, S_R0] = scal[0, S_R1]
        scal[0, S_R1] = scal[0, S_PW] if jacobi else scal[0, S_RR]
        if jacobi:
            scal[0, S_RR2] = scal[0, S_RR]
        r1_ref[lane, 0] = scal[0, S_RR]


def cg_pallas_pipelined_batched(
    x0, b_residual, op, gm, ktw, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lane-batched single-launch CG.

    All array args carry a leading batch dim B (op/gm field-wise). Lanes
    execute sequentially on the core with exact per-lane stopping; the win
    over vmap-of-jnp-CG is that the whole batch is ONE kernel launch at
    the bandwidth roofline. Returns (x (B,h,w), iters (B,), r1 (B,)).
    """
    B, h, w = x0.shape
    if sf not in (1, 2, 4):
        raise ValueError(f"unsupported sf: {sf}")
    th = pick_th(h, w, pipelined=True)
    if th is None:
        raise ValueError(f"grid too wide for pipelined pallas CG: {w}")
    geo = geometry(h, w, th)
    F = jax.vmap(lambda o, g, k: stack_fields_packed(o, g, k, geo))(
        op, gm, ktw)
    zero = jnp.zeros((B,) + geo.shape, jnp.float32)
    T = jnp.stack([
        jax.vmap(lambda a: pad_field(a, geo))(jnp.asarray(x0, jnp.float32)),
        jax.vmap(lambda a: pad_field(a, geo))(
            jnp.asarray(b_residual, jnp.float32)),
        zero, zero, zero,
    ], axis=1)  # (B, 5, Hp+2R, Wp)
    r1_0 = jnp.sum(T[:, 1] * T[:, 1], axis=(1, 2))  # (B,)
    consts = jnp.stack([
        jnp.full((B,), jnp.float32(tol) ** 2),
        r1_0,
        jnp.full((B,), jnp.float32(max_iter)),
    ], axis=1)  # (B, 3)

    n_bands = geo.n_bands
    kernel = functools.partial(_kernel, lam=lam, sf=sf, n_bands=n_bands,
                               th=geo.th)
    T_new, iters, r1, _scal = pl.pallas_call(
        kernel,
        grid=(B, max_iter + 1, 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(consts, T, F)
    x = jax.vmap(lambda a: unpad_field(a, geo))(T_new[:, TX])
    return x, iters[:, 0].astype(jnp.int32), r1[:, 0]


def cg_pallas_pipelined_fromop_batched(
    x0, op, gm, ktw, z0t, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100, invd=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lane-batched single-launch CG with the initial residual computed
    IN-KERNEL (iteration-0 prologue): instead of a host-side
    ``rhs - M x0`` (two full jnp passes per outer iteration), the kernel
    streams the QB fields and the precomputed ``z0t = KT^T z0s`` once and
    forms r0 band-by-band. Args as :func:`cg_pallas_pipelined_batched`
    but with (op, z0t) replacing b_residual; z0t carries a leading batch
    dim like x0. With ``invd`` (batched 1/diag(M) field) the kernel runs
    Jacobi-preconditioned CG with jnp-PCG stopping semantics (<r, r>
    tested, rz recurrence for beta/alpha)."""
    B, h, w = x0.shape
    jacobi = invd is not None
    if sf not in (1, 2, 4):
        raise ValueError(f"unsupported sf: {sf}")
    th = pick_th(h, w, pipelined=True, jacobi=jacobi)
    if th is None:
        raise ValueError(f"grid too wide for pipelined pallas CG: {w}")
    geo = geometry(h, w, th)
    if jacobi:
        F = jax.vmap(lambda o, g, k, i: stack_fields_packed(
            o, g, k, geo, invd=i))(op, gm, ktw, jnp.asarray(
                invd, jnp.float32))
    else:
        F = jax.vmap(lambda o, g, k: stack_fields_packed(o, g, k, geo))(
            op, gm, ktw)
    R0 = jax.vmap(lambda o, z: jnp.stack(
        [pad_field(r, geo) for r in (o.QB1, o.QB2, o.QB3, z)]))(
            op, jnp.asarray(z0t, jnp.float32))
    zero = jnp.zeros((B,) + geo.shape, jnp.float32)
    T = jnp.stack([
        jax.vmap(lambda a: pad_field(a, geo))(jnp.asarray(x0, jnp.float32)),
        zero, zero, zero, zero,
    ], axis=1)  # (B, 5, Hp+2R, Wp)
    consts = jnp.stack([
        jnp.full((B,), jnp.float32(tol) ** 2),
        jnp.zeros((B,), jnp.float32),  # r1_init unused (computed in-kernel)
        jnp.full((B,), jnp.float32(max_iter)),
    ], axis=1)  # (B, 3)

    n_bands = geo.n_bands
    kernel = functools.partial(_kernel, lam=lam, sf=sf, n_bands=n_bands,
                               th=geo.th, fromop=True, jacobi=jacobi)
    T_new, iters, r1, _scal = pl.pallas_call(
        kernel,
        grid=(B, max_iter + 2, 2),
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


def cg_pallas_pipelined_fromop(
    x0, op, gm, ktw, z0t, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100, invd=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-problem wrapper over the fromop (in-kernel r0) variant."""
    add_b = lambda a: jnp.asarray(a)[None]
    x, iters, r1 = cg_pallas_pipelined_fromop_batched(
        add_b(x0),
        jax.tree_util.tree_map(add_b, op),
        jax.tree_util.tree_map(add_b, gm),
        add_b(ktw), add_b(z0t), sf=sf, lam=lam, tol=tol, max_iter=max_iter,
        invd=None if invd is None else add_b(invd))
    return x[0], iters[0], r1[0]


def cg_pallas_pipelined(
    x0, b_residual, op, gm, ktw, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-launch, band-pipelined CG. Same semantics as cg_pallas."""
    add_b = lambda a: jnp.asarray(a)[None]
    x, iters, r1 = cg_pallas_pipelined_batched(
        add_b(x0), add_b(b_residual),
        jax.tree_util.tree_map(add_b, op),
        jax.tree_util.tree_map(add_b, gm),
        add_b(ktw), sf=sf, lam=lam, tol=tol, max_iter=max_iter)
    return x[0], iters[0], r1[0]
