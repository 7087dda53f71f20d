"""Generation-2 per-shard Pallas CG kernels for the row-band sharded path.

Round-2's ``shard_cg.cg_sharded_pallas`` ran the *two-call* band kernels
(one launch per phase per iteration) with a jnp-side rhs/matvec building
the initial residual, and required the band height to divide the shard
height exactly — which degraded 1080p/8 (h_b = 136) to th = 8 with a
16-row alignment ring per band (~3x redundant DMA). This module closes
all three gaps (VERDICT r2 item 3):

  (a) **CGS sweep kernel**: the Chronopoulos-Gear recurrence has a single
      reduction point per iteration, so the whole iteration (p/s/x/r
      updates + matvec + both dot products) is ONE per-shard kernel
      launch; per CG iteration the communication is 1 stacked 2-row halo
      exchange of (r, w, s) (2 ppermutes) + 1 fused psum of
      (gamma, delta). This is the flagship multi-chip configuration
      (``--sharded --pallas --cg-variant cgs``).
  (b) **In-kernel r0 prologue** (both variants): r0 = rhs - M x0 is built
      band-by-band from the packed QB/z0t fields, replacing the two jnp
      full-grid passes per depth solve.
  (c) **Tail-band geometry**: the last band *overlaps* its predecessor
      (start = h_b - th instead of b*th) so any 8-aligned shard height
      runs at full band height; overlap rows are written idempotently
      (ping-pong buffers make every read come from the unmodified source)
      and masked out of the dot products by a row-ownership predicate.

Standard CG inherently needs two global reductions per iteration
(<p,Mp> gates the axpy that produces <r,r>), so the standard variant
keeps a two-launch structure — but now with the fromop prologue, packed
8-row F layout, and tail bands.

Reference anchor: the sharded analog of devicecalls.cu:229-279 (the CG
hot loop), scheduled for ICI-connected TPU shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..solve import pallas_cg as _pcg
from ..solve.pallas_cg import RING, _shift, _tilesum, pad_field, unpad_field
from ..solve.pallas_cg_cgs import _matvec_band
from ..solve.pallas_cg_pipe import KTW, MB, _unpack_masks, stack_fields_packed
from ..solve.pallas_cg_vmem import (
    N_STENCIL, _build_c_band, _stencil_w, stack_fields_rows)

# Rows of the stacked per-shard state T. CGS (5 rows): rows 1..3 =
# (r, w, s) are CONTIGUOUS so the per-iteration halo refresh is one
# stacked ppermute pair. Standard CG (7 rows): (x, r) are PING-PONGED by
# iteration parity — bands overlap under tail geometry, and an in-place
# read-modify-write of overlap rows is not idempotent (and has divergent
# aliasing semantics between interpret mode and hardware); with separate
# src/dst rows every band reads only unmodified data, so overlap writes
# are exact duplicates. Both layouts share rows 0..2 = (x, r, w) for the
# prologue.
TX, TR, TW = 0, 1, 2
TS, TP = 3, 4                  # CGS: s = M p and the direction p
TX1, TR1, TP0, TP1 = 3, 4, 5, 6  # std: parity-1 x/r + ping-pong p rows
TZ = 7                         # std+jacobi: z = invd * r (single row —
#                                phase B writes it from in-kernel r_dst,
#                                never reads it, so tail-band overlap
#                                rewrites are exact duplicates)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def pick_th_shard(h_b: int, w: int, vmem_budget: int = 28 << 20):
    """Largest band height whose scoped-VMEM footprint fits at this width.

    Tail-band overlap removes the divisibility constraint: any 8-aligned
    h_b >= th works (the last band starts at h_b - th)."""
    wp = -(-w // 128) * 128
    for th in (64, 32, 16, 8):
        if th > h_b:
            continue
        tb = th + 2 * RING
        rows = max(2 * (13 * tb + 2 * th), 2 * (11 * tb + 7 * th))
        if rows * wp * 4 <= vmem_budget:
            return th
    return None


def shard_pallas_supported(h: int, w: int, sf: int, n_shards: int) -> bool:
    if h % n_shards:
        return False
    h_b = h // n_shards
    return (h_b % 8 == 0 and sf in (1, 2, 4)
            and pick_th_shard(h_b, w) is not None
            and (_pcg.INTERPRET
                 or jax.default_backend() in ("tpu", "axon")))


def _band_start(b, th: int, h_b: int):
    """Band b's first interior row; the last band overlaps backwards."""
    return jnp.minimum(b * th, h_b - th)


def _own_from(b, th: int, h_b: int):
    """First band-local row OWNED by band b (rows below are the overlap
    re-computing the previous band's rows — excluded from reductions)."""
    return b * th - _band_start(b, th, h_b)


def _row_own_mask(b, th: int, h_b: int, wp: int):
    ow = _own_from(b, th, h_b)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
    return (rows >= ow).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _prologue_kernel(T_hbm, F_hbm, R0_hbm, T_out, gd_ref, *,
                     lam: float, sf: int, th: int, h_b: int, n_bands: int,
                     with_w0: bool):
    """r0 = rhs - M x0 (+ optionally w0 = M r0) band-by-band, double
    buffered; accumulates gamma = <r0, r0> (and delta = <w0, r0>) over
    owned rows. x's ring rows must hold real neighbour values (8-row
    exchange done by the wrapper)."""
    TH = th
    TB = TH + 2 * RING
    wp = T_out.shape[-1]
    n_out = 2 if with_w0 else 1

    def body(x_bufs, f_bufs, q_bufs, rw_bufs, in_sems, out_sems):
        def start_in(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                T_out.at[TX, pl.ds(st, TB), :],
                x_bufs.at[slot], in_sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                F_hbm.at[:, pl.ds(st, TB), :],
                f_bufs.at[slot], in_sems.at[slot, 1]).start()
            pltpu.make_async_copy(
                R0_hbm.at[:, pl.ds(st, TB), :],
                q_bufs.at[slot], in_sems.at[slot, 2]).start()

        def wait_in(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                T_out.at[TX, pl.ds(st, TB), :],
                x_bufs.at[slot], in_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                F_hbm.at[:, pl.ds(st, TB), :],
                f_bufs.at[slot], in_sems.at[slot, 1]).wait()
            pltpu.make_async_copy(
                R0_hbm.at[:, pl.ds(st, TB), :],
                q_bufs.at[slot], in_sems.at[slot, 2]).wait()

        def wait_out(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                rw_bufs.at[slot],
                T_out.at[pl.ds(TR, n_out), pl.ds(st + RING, TH), :],
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
            # w = M x0 on the full band (ring rows valid to depth 4).
            g = fwd_x * (_shift(x, 0, 1) - x) + bwd_x * (x - _shift(x, 0, -1))
            h = fwd_y * (_shift(x, 1, 0) - x) + bwd_y * (x - _shift(x, -1, 0))
            t1 = f[_pcg.P11] * g + f[_pcg.P12] * h - f[_pcg.P13] * x
            t2 = f[_pcg.P12] * g + f[_pcg.P22] * h - f[_pcg.P23] * x
            t3 = f[_pcg.P13] * g + f[_pcg.P23] * h - f[_pcg.P33] * x
            f1 = fwd_x * t1
            b1 = bwd_x * t1
            dxt = _shift(f1, 0, -1) - f1 + b1 - _shift(b1, 0, 1)
            f2 = fwd_y * t2
            b2 = bwd_y * t2
            dyt = _shift(f2, -1, 0) - f2 + b2 - _shift(b2, 1, 0)
            w_full = f[KTW] * _tilesum(x, sf) + lam * (dxt + dyt - t3)
            # rhs = z0t + lam * (Dx' QB1 + Dy' QB2 - QB3)
            q = q_bufs.at[slot]
            q1 = fwd_x * q[0]
            q1b = bwd_x * q[0]
            dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
            q2 = fwd_y * q[1]
            q2b = bwd_y * q[1]
            dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
            rhs_full = q[3] + lam * (dxq + dyq - q[2])
            r0_full = rhs_full - w_full
            r0 = r0_full[RING:RING + TH, :]
            if with_w0:
                w0 = _matvec_band(r0_full, f, lam, sf, TH)

            @pl.when(b >= 2)
            def _():
                wait_out(b - 2)

            rw_bufs[slot, 0] = r0
            if with_w0:
                rw_bufs[slot, 1] = w0
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                rw_bufs.at[slot],
                T_out.at[pl.ds(TR, n_out), pl.ds(st + RING, TH), :],
                out_sems.at[slot]).start()
            rmask = _row_own_mask(b, TH, h_b, wp)
            gamma = gamma + jnp.sum(rmask * r0 * r0)
            if with_w0:
                delta = delta + jnp.sum(rmask * w0 * r0)
            return (gamma, delta)

        gamma, delta = lax.fori_loop(
            0, n_bands, loop, (jnp.float32(0.0), jnp.float32(0.0)))
        if n_bands >= 2:
            wait_out(n_bands - 2)
        wait_out(n_bands - 1)
        gd_ref[0, 0] = gamma
        gd_ref[0, 1] = delta

    pl.run_scoped(
        body,
        x_bufs=pltpu.VMEM((2, TB, wp), jnp.float32),
        f_bufs=pltpu.VMEM((2, 8, TB, wp), jnp.float32),
        q_bufs=pltpu.VMEM((2, 4, TB, wp), jnp.float32),
        rw_bufs=pltpu.VMEM((2, n_out, TH, wp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 3)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _cgs_sweep_kernel(consts_ref, Tsrc_hbm, F_hbm, Tdst_in, T_out, gd_ref, *,
                      lam: float, sf: int, th: int, h_b: int, n_bands: int,
                      stencil: bool = False):
    """One full CGS iteration over the shard's bands: ping-pong read from
    Tsrc, write every state row's owned interior into T_out (= donated
    Tdst); accumulate (gamma, delta) over owned rows.

    With ``stencil=True`` (sf <= 2) the F operand is the shard's 9
    collapsed coefficient planes (interior rows only — C is indexed by
    OUTPUT row, so it needs no ring) and the matvec is the 9-FMA roll
    sweep (:func:`..solve.pallas_cg_vmem._stencil_w`): fewer bytes per
    band (9*TH vs 8*TB rows) and ~half the VPU work."""
    TH = th
    TB = TH + 2 * RING
    NF, FB = (N_STENCIL, TH) if stencil else (8, TB)
    wp = T_out.shape[-1]
    beta = consts_ref[0, 0]
    alpha = consts_ref[0, 1]

    def body(rws_bufs, xp_bufs, f_bufs, o_bufs, in_sems, out_sems):
        def _f_copy(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            src = (F_hbm.at[:, pl.ds(st, TH), :] if stencil
                   else F_hbm.at[:, pl.ds(st, TB), :])
            return pltpu.make_async_copy(src, f_bufs.at[slot],
                                         in_sems.at[slot, 3])

        def start_in(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                Tsrc_hbm.at[pl.ds(TR, 3), pl.ds(st, TB), :],
                rws_bufs.at[slot], in_sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                Tsrc_hbm.at[pl.ds(TX, 1), pl.ds(st + RING, TH), :],
                xp_bufs.at[slot, pl.ds(0, 1)], in_sems.at[slot, 1]).start()
            pltpu.make_async_copy(
                Tsrc_hbm.at[pl.ds(TP, 1), pl.ds(st + RING, TH), :],
                xp_bufs.at[slot, pl.ds(1, 1)], in_sems.at[slot, 2]).start()
            _f_copy(b).start()

        def wait_in(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                Tsrc_hbm.at[pl.ds(TR, 3), pl.ds(st, TB), :],
                rws_bufs.at[slot], in_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                Tsrc_hbm.at[pl.ds(TX, 1), pl.ds(st + RING, TH), :],
                xp_bufs.at[slot, pl.ds(0, 1)], in_sems.at[slot, 1]).wait()
            pltpu.make_async_copy(
                Tsrc_hbm.at[pl.ds(TP, 1), pl.ds(st + RING, TH), :],
                xp_bufs.at[slot, pl.ds(1, 1)], in_sems.at[slot, 2]).wait()
            _f_copy(b).wait()

        def wait_out(b):
            slot = lax.rem(b, 2)
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                o_bufs.at[slot],
                T_out.at[:, pl.ds(st + RING, TH), :],
                out_sems.at[slot]).wait()

        start_in(0)

        def loop(b, acc):
            gamma, delta = acc
            slot = lax.rem(b, 2)

            @pl.when(b + 1 < n_bands)
            def _():
                start_in(b + 1)

            wait_in(b)
            r = rws_bufs[slot, 0]   # TB rows (2 valid ring rows at edges)
            w = rws_bufs[slot, 1]   # TB rows
            s = rws_bufs[slot, 2]   # TB rows
            x = xp_bufs[slot, 0]    # TH rows
            p = xp_bufs[slot, 1]    # TH rows
            f = f_bufs.at[slot]
            s_new = w + beta * s                       # halo-exact
            r_new = r - alpha * s_new                  # halo-exact
            p_new = r[RING:RING + TH, :] + beta * p
            x_new = x + alpha * p_new
            w_new = (_stencil_w(r_new, f, TH) if stencil
                     else _matvec_band(r_new, f, lam, sf, TH))
            r_in = r_new[RING:RING + TH, :]

            @pl.when(b >= 2)
            def _():
                wait_out(b - 2)

            o_bufs[slot, TX] = x_new
            o_bufs[slot, TR] = r_in
            o_bufs[slot, TW] = w_new
            o_bufs[slot, TS] = s_new[RING:RING + TH, :]
            o_bufs[slot, TP] = p_new
            st = _band_start(b, TH, h_b)
            pltpu.make_async_copy(
                o_bufs.at[slot],
                T_out.at[:, pl.ds(st + RING, TH), :],
                out_sems.at[slot]).start()
            rmask = _row_own_mask(b, TH, h_b, wp)
            return (gamma + jnp.sum(rmask * r_in * r_in),
                    delta + jnp.sum(rmask * w_new * r_in))

        gamma, delta = lax.fori_loop(
            0, n_bands, loop, (jnp.float32(0.0), jnp.float32(0.0)))
        if n_bands >= 2:
            wait_out(n_bands - 2)
        wait_out(n_bands - 1)
        gd_ref[0, 0] = gamma
        gd_ref[0, 1] = delta

    pl.run_scoped(
        body,
        rws_bufs=pltpu.VMEM((2, 3, TB, wp), jnp.float32),
        xp_bufs=pltpu.VMEM((2, 2, TH, wp), jnp.float32),
        f_bufs=pltpu.VMEM((2, NF, FB, wp), jnp.float32),
        o_bufs=pltpu.VMEM((2, 5, TH, wp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 4)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _std_kernel_a(consts_ref, T_hbm, F_hbm, T_out, pw_ref, *,
                  lam: float, sf: int, th: int, h_b: int, n_bands: int,
                  stencil: bool = False):
    """Standard-CG phase A: p_dst = r + beta p_src; w = M p_dst;
    pw += <p, w> over owned rows. consts = [beta, p_src, p_dst, r_row].
    ``stencil=True``: F operand = 9 interior-row coefficient planes, the
    matvec is the 9-FMA roll sweep (see _cgs_sweep_kernel)."""
    TH = th
    TB = TH + 2 * RING
    NF, FB = (N_STENCIL, TH) if stencil else (8, TB)
    wp = T_out.shape[-1]
    i = pl.program_id(0)
    beta = consts_ref[0, 0]
    p_src = consts_ref[0, 1].astype(jnp.int32)
    p_dst = consts_ref[0, 2].astype(jnp.int32)
    r_row = consts_ref[0, 3].astype(jnp.int32)
    st = _band_start(i, TH, h_b)

    @pl.when(i == 0)
    def _():
        pw_ref[0, 0] = 0.0

    def body(r_buf, p_buf, f_buf, w_buf, sems, out_sems):
        cp_r = pltpu.make_async_copy(
            T_hbm.at[r_row, pl.ds(st, TB), :], r_buf, sems.at[0])
        cp_p = pltpu.make_async_copy(
            T_hbm.at[p_src, pl.ds(st, TB), :], p_buf, sems.at[1])
        cp_f = pltpu.make_async_copy(
            F_hbm.at[:, pl.ds(st, TH), :] if stencil
            else F_hbm.at[:, pl.ds(st, TB), :], f_buf, sems.at[2])
        cp_r.start()
        cp_p.start()
        cp_f.start()
        cp_r.wait()
        cp_p.wait()
        p = r_buf[:] + beta * p_buf[:]
        cp_f.wait()
        w = (_stencil_w(p, f_buf, TH) if stencil
             else _matvec_band(p, f_buf, lam, sf, TH))
        pin = p[RING:RING + TH, :]
        p_buf[RING:RING + TH, :] = pin
        w_buf[:] = w
        o_p = pltpu.make_async_copy(
            p_buf.at[pl.ds(RING, TH), :],
            T_out.at[p_dst, pl.ds(st + RING, TH), :], out_sems.at[0])
        o_w = pltpu.make_async_copy(
            w_buf, T_out.at[TW, pl.ds(st + RING, TH), :], out_sems.at[1])
        o_p.start()
        o_w.start()
        rmask = _row_own_mask(i, TH, h_b, wp)
        pw_ref[0, 0] += jnp.sum(rmask * pin * w)
        o_p.wait()
        o_w.wait()

    pl.run_scoped(
        body,
        r_buf=pltpu.VMEM((TB, wp), jnp.float32),
        p_buf=pltpu.VMEM((TB, wp), jnp.float32),
        f_buf=pltpu.VMEM((NF, FB, wp), jnp.float32),
        w_buf=pltpu.VMEM((TH, wp), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((3,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _std_kernel_b(consts_ref, T_hbm, T_out, rr_ref, *,
                  th: int, h_b: int, n_bands: int):
    """Standard-CG phase B: x_dst = x_src + alpha p; r_dst = r_src -
    alpha w; rr += <r, r> over owned rows. (x, r) ping-pong between row
    pairs (0, 1) and (3, 4) so overlap-band writes are idempotent.
    consts = [alpha, p_dst, base_src, base_dst]."""
    TH = th
    wp = T_out.shape[-1]
    i = pl.program_id(0)
    alpha = consts_ref[0, 0]
    p_dst = consts_ref[0, 1].astype(jnp.int32)
    base_src = consts_ref[0, 2].astype(jnp.int32)
    base_dst = consts_ref[0, 3].astype(jnp.int32)
    st = _band_start(i, TH, h_b)

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = 0.0

    def body(xr_buf, w_buf, p_buf, sems, out_sem):
        cp_xr = pltpu.make_async_copy(
            T_hbm.at[pl.ds(base_src, 2), pl.ds(st + RING, TH), :], xr_buf,
            sems.at[0])
        cp_w = pltpu.make_async_copy(
            T_hbm.at[TW, pl.ds(st + RING, TH), :], w_buf, sems.at[1])
        cp_p = pltpu.make_async_copy(
            T_hbm.at[p_dst, pl.ds(st + RING, TH), :], p_buf, sems.at[2])
        cp_xr.start()
        cp_w.start()
        cp_p.start()
        cp_xr.wait()
        cp_w.wait()
        cp_p.wait()
        x = xr_buf[0] + alpha * p_buf[:]
        r = xr_buf[1] - alpha * w_buf[:]
        xr_buf[0] = x
        xr_buf[1] = r
        o = pltpu.make_async_copy(
            xr_buf,
            T_out.at[pl.ds(base_dst, 2), pl.ds(st + RING, TH), :], out_sem)
        o.start()
        rmask = _row_own_mask(i, TH, h_b, wp)
        rr_ref[0, 0] += jnp.sum(rmask * r * r)
        o.wait()

    pl.run_scoped(
        body,
        xr_buf=pltpu.VMEM((2, TH, wp), jnp.float32),
        w_buf=pltpu.VMEM((TH, wp), jnp.float32),
        p_buf=pltpu.VMEM((TH, wp), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((3,)),
        out_sem=pltpu.SemaphoreType.DMA(()),
    )


def _std_kernel_b_jac(consts_ref, T_hbm, INVD_hbm, T_out, rz_rr_ref, *,
                      th: int, h_b: int, n_bands: int):
    """Jacobi phase B: x_dst = x_src + alpha p; r_dst = r_src - alpha w;
    z = invd * r_dst; accumulates the fused (rz, rr) = (<r,z>, <r,r>)
    pair over owned rows (ONE psum on the shard_map side drives both the
    beta recurrence and the stopping rule — same shape as the single-chip
    preconditioned solve.cg). consts = [alpha, p_dst, base_src,
    base_dst]."""
    TH = th
    wp = T_out.shape[-1]
    i = pl.program_id(0)
    alpha = consts_ref[0, 0]
    p_dst = consts_ref[0, 1].astype(jnp.int32)
    base_src = consts_ref[0, 2].astype(jnp.int32)
    base_dst = consts_ref[0, 3].astype(jnp.int32)
    st = _band_start(i, TH, h_b)

    @pl.when(i == 0)
    def _():
        rz_rr_ref[0, 0] = 0.0
        rz_rr_ref[0, 1] = 0.0

    def body(xr_buf, w_buf, p_buf, d_buf, z_buf, sems, out_sems):
        cp_xr = pltpu.make_async_copy(
            T_hbm.at[pl.ds(base_src, 2), pl.ds(st + RING, TH), :], xr_buf,
            sems.at[0])
        cp_w = pltpu.make_async_copy(
            T_hbm.at[TW, pl.ds(st + RING, TH), :], w_buf, sems.at[1])
        cp_p = pltpu.make_async_copy(
            T_hbm.at[p_dst, pl.ds(st + RING, TH), :], p_buf, sems.at[2])
        cp_d = pltpu.make_async_copy(
            INVD_hbm.at[pl.ds(st + RING, TH), :], d_buf, sems.at[3])
        cp_xr.start()
        cp_w.start()
        cp_p.start()
        cp_d.start()
        cp_xr.wait()
        cp_w.wait()
        cp_p.wait()
        x = xr_buf[0] + alpha * p_buf[:]
        r = xr_buf[1] - alpha * w_buf[:]
        cp_d.wait()
        z = d_buf[:] * r
        xr_buf[0] = x
        xr_buf[1] = r
        z_buf[:] = z
        o = pltpu.make_async_copy(
            xr_buf,
            T_out.at[pl.ds(base_dst, 2), pl.ds(st + RING, TH), :],
            out_sems.at[0])
        o_z = pltpu.make_async_copy(
            z_buf, T_out.at[TZ, pl.ds(st + RING, TH), :], out_sems.at[1])
        o.start()
        o_z.start()
        rmask = _row_own_mask(i, TH, h_b, wp)
        rz_rr_ref[0, 0] += jnp.sum(rmask * r * z)
        rz_rr_ref[0, 1] += jnp.sum(rmask * r * r)
        o.wait()
        o_z.wait()

    pl.run_scoped(
        body,
        xr_buf=pltpu.VMEM((2, TH, wp), jnp.float32),
        w_buf=pltpu.VMEM((TH, wp), jnp.float32),
        p_buf=pltpu.VMEM((TH, wp), jnp.float32),
        d_buf=pltpu.VMEM((TH, wp), jnp.float32),
        z_buf=pltpu.VMEM((TH, wp), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((4,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_CPARAMS = dict(has_side_effects=True, vmem_limit_bytes=40 << 20)


def _call_prologue(T, F, R0, geo, lam, sf, h_b, with_w0):
    kernel = functools.partial(
        _prologue_kernel, lam=lam, sf=sf, th=geo.th, h_b=h_b,
        n_bands=geo.n_bands, with_w0=with_w0)
    T_new, gd = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(T.shape, T.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=_pcg.INTERPRET,
    )(T, F, R0)
    return T_new, gd


def _call_cgs_sweep(T_src, T_dst, F, beta, alpha, geo, lam, sf, h_b,
                    stencil=False):
    consts = jnp.stack([beta, alpha]).reshape(1, 2)
    kernel = functools.partial(
        _cgs_sweep_kernel, lam=lam, sf=sf, th=geo.th, h_b=h_b,
        n_bands=geo.n_bands, stencil=stencil)
    T_new, gd = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(T_src.shape, T_src.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=_pcg.INTERPRET,
    )(consts, T_src, F, T_dst)
    return T_new, gd


def _call_std_a(T, F, beta, p_src, p_dst, r_row, geo, lam, sf, h_b,
                stencil=False):
    consts = jnp.stack([beta, p_src.astype(jnp.float32),
                        p_dst.astype(jnp.float32),
                        r_row.astype(jnp.float32)]).reshape(1, 4)
    kernel = functools.partial(
        _std_kernel_a, lam=lam, sf=sf, th=geo.th, h_b=h_b,
        n_bands=geo.n_bands, stencil=stencil)
    T_new, pw = pl.pallas_call(
        kernel,
        grid=(geo.n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(T.shape, T.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=_pcg.INTERPRET,
    )(consts, T, F)
    return T_new, pw


def _call_std_b_jac(T, INVD, alpha, p_dst, base_src, base_dst, geo, h_b):
    consts = jnp.stack([alpha, p_dst.astype(jnp.float32),
                        base_src.astype(jnp.float32),
                        base_dst.astype(jnp.float32)]).reshape(1, 4)
    kernel = functools.partial(
        _std_kernel_b_jac, th=geo.th, h_b=h_b, n_bands=geo.n_bands)
    T_new, rz_rr = pl.pallas_call(
        kernel,
        grid=(geo.n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(T.shape, T.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=_pcg.INTERPRET,
    )(consts, T, INVD)
    return T_new, rz_rr


def _call_std_b(T, alpha, p_dst, base_src, base_dst, geo, h_b):
    consts = jnp.stack([alpha, p_dst.astype(jnp.float32),
                        base_src.astype(jnp.float32),
                        base_dst.astype(jnp.float32)]).reshape(1, 4)
    kernel = functools.partial(
        _std_kernel_b, th=geo.th, h_b=h_b, n_bands=geo.n_bands)
    T_new, rr = pl.pallas_call(
        kernel,
        grid=(geo.n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(T.shape, T.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(**_CPARAMS),
        interpret=_pcg.INTERPRET,
    )(consts, T)
    return T_new, rr


# ---------------------------------------------------------------------------
# Halo plumbing (shard_map side)
# ---------------------------------------------------------------------------


def _ppermute_updown(top_edge, bot_edge, axis_name):
    """Returns (from_above, from_below): my top ring rows = neighbour
    above's bottom interior edge, and vice versa; zeros at the global
    boundary (matching pad_field's zero ring)."""
    n = lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i, i - 1) for i in range(1, n)]
    from_above = lax.ppermute(bot_edge, axis_name, down)
    from_below = lax.ppermute(top_edge, axis_name, up)
    return from_above, from_below


def _ring_exchange(A, h_b: int, axis_name: str, rows: int):
    """Refresh `rows` ring rows of a (…, Hp, Wp) padded array from the
    neighbouring shards' interior edges (2 ppermutes for the whole
    stacked leading axis)."""
    R = RING
    top_edge = A[..., R:R + rows, :]
    bot_edge = A[..., R + h_b - rows:R + h_b, :]
    from_above, from_below = _ppermute_updown(top_edge, bot_edge, axis_name)
    A = A.at[..., R - rows:R, :].set(from_above)
    A = A.at[..., R + h_b:R + h_b + rows, :].set(from_below)
    return A


def _exchange_T_rows(T, lo: int, n: int, h_b: int, axis_name: str,
                     rows: int = 2):
    """Ring-exchange rows [lo, lo+n) of the stacked state T in one
    ppermute pair."""
    sub = _ring_exchange(T[lo:lo + n], h_b, axis_name, rows)
    return T.at[lo:lo + n].set(sub)


# ---------------------------------------------------------------------------
# Sharded CG drivers
# ---------------------------------------------------------------------------


def _local_fields(op_l, gm_l, mask_l, masks_l, z0t_l, sf, geo, h_b,
                  axis_name):
    """Packed F + R0 for the local shard, rings refreshed (8 rows, once
    per solve) so in-kernel stencil compositions see real neighbours."""
    ktw_l = _pcg.make_ktw(mask_l, masks_l, sf)
    F = stack_fields_packed(op_l, gm_l, ktw_l, geo)
    F = _ring_exchange(F, h_b, axis_name, RING)
    R0 = jnp.stack([pad_field(r, geo) for r in (
        op_l.QB1, op_l.QB2, op_l.QB3, jnp.asarray(z0t_l, jnp.float32))])
    R0 = _ring_exchange(R0, h_b, axis_name, RING)
    return F, R0


def _local_stencil_planes(op_l, gm_l, mask_l, masks_l, sf, geo, h_b,
                          axis_name, lam):
    """The shard's (9, h_b, wp) collapsed 9-point coefficient planes
    (``pallas_cg_vmem._build_c_band`` on the whole shard), built ONCE per
    depth solve in jnp — amortised over the ~100 in-kernel sweeps that
    then run at half the direct matvec's VPU cost. C is indexed by OUTPUT
    row, so it needs no per-iteration halo; the one-time F-ring refresh
    it is built from supplies the cross-shard neighbour coefficients.
    Requires sf <= 2 (the box-resample tile mates must lie within +-1)
    and an even shard height (global/local row parity must agree for the
    KT^T KT phase fold — guaranteed: shard heights are sf-aligned)."""
    ktw_l = _pcg.make_ktw(mask_l, masks_l, sf)
    Fr = stack_fields_rows(op_l, gm_l, ktw_l, geo)
    Fr = _ring_exchange(Fr, h_b, axis_name, RING)
    return _build_c_band(Fr, lam, sf, h_b)


def cg_sharded_pallas_cgs(
    mesh: Mesh,
    axis_name: str,
    x0, op, gm, mask, masks, z0t,
    *, sf: int, lam: float, tol: float = 1e-9, max_iter: int = 100,
    stencil=None, invd=None,
):
    if invd is not None:
        # Mirrors the single-chip gate: no preconditioned CGS recurrence
        # exists (solve/pallas_cg_cgs.py) — route jacobi through std.
        raise ValueError("jacobi is not supported on the CGS variant; "
                         "use cg_sharded_pallas_std")
    """Chronopoulos-Gear sharded CG with per-shard Pallas sweep kernels.

    Per iteration: 1 kernel launch, 1 stacked 2-row halo exchange of
    (r, w, s) (2 ppermutes), 1 fused psum of (gamma, delta). The initial
    residual AND w0 come from the in-kernel prologue. Same recurrence
    (and stopping semantics) as shard_cg.cg_sharded_cgs. ``stencil``:
    None = auto (9-point collapsed sweep for sf <= 2, the single-chip
    resident kernel's halved-cost matvec); False forces the direct
    packed-F matvec.
    """
    return _run_sharded_pallas(
        mesh, axis_name, x0, op, gm, mask, masks, z0t, sf=sf, lam=lam,
        tol=tol, max_iter=max_iter, variant="cgs", stencil=stencil)


class _TailGeo(_pcg.PaddedGeometry):
    @property
    def n_bands(self):  # ceil instead of exact division
        return -(-self.hp // self.th)


def _run_sharded_pallas(mesh, axis_name, x0, op, gm, mask, masks, z0t, *,
                        sf, lam, tol, max_iter, variant, stencil=None,
                        invd=None):
    h, w = x0.shape
    n_shards = mesh.shape[axis_name]
    h_b = h // n_shards
    th = pick_th_shard(h_b, w)
    if th is None:
        raise ValueError(f"unsupported shard geometry: h_b={h_b}, w={w}")
    if stencil is None:
        stencil = sf in (1, 2)   # auto: collapse where the fold is exact
    elif stencil and sf not in (1, 2):
        raise ValueError("stencil sweep requires sf <= 2")
    jacobi = invd is not None
    if jacobi and variant != "std":
        raise ValueError("jacobi requires the std variant")
    wp = -(-w // 128) * 128
    geo = _TailGeo(h_b, w, h_b, wp, th)
    tol_sq = jnp.float32(tol) ** 2

    def body_fn(x0_l, P11, P12, P13, P22, P23, P33, QB1, QB2, QB3,
                fwd_x, bwd_x, fwd_y, bwd_y, mask_l, masks_l, z0t_l,
                *invd_args):
        from types import SimpleNamespace

        op_l = SimpleNamespace(P11=P11, P12=P12, P13=P13, P22=P22,
                               P23=P23, P33=P33, QB1=QB1, QB2=QB2, QB3=QB3)
        gm_l = SimpleNamespace(fwd_x=fwd_x, bwd_x=bwd_x,
                               fwd_y=fwd_y, bwd_y=bwd_y)
        F, R0 = _local_fields(op_l, gm_l, mask_l, masks_l, z0t_l, sf, geo,
                              h_b, axis_name)
        # Sweep-kernel coefficient operand: the 9 collapsed stencil
        # planes when the fold is exact (sf <= 2), else the packed F.
        C = (_local_stencil_planes(op_l, gm_l, mask_l, masks_l, sf, geo,
                                   h_b, axis_name, lam)
             if stencil else F)
        T = jnp.zeros((5,) + geo.shape, jnp.float32)
        T = T.at[TX].set(pad_field(jnp.asarray(x0_l, jnp.float32), geo))
        # x ring rows must be real neighbour values for the prologue's
        # depth-4 stencil composition.
        T = _exchange_T_rows(T, TX, 1, h_b, axis_name, rows=RING)
        psum = lambda v: lax.psum(v, axis_name)

        if variant == "cgs":
            T, gd = _call_prologue(T, F, R0, geo, lam, sf, h_b,
                                   with_w0=True)
            T = _exchange_T_rows(T, TR, 2, h_b, axis_name)  # r, w rings
            gdv = psum(gd[0])
            T_alt = jnp.zeros_like(T)

            def cond(c):
                T_cur, T_alt, g_old, a_old, gdv, k = c
                return (gdv[0] > tol_sq) & (k <= max_iter)

            def body(c):
                T_cur, T_alt, g_old, a_old, gdv, k = c
                gamma, delta = gdv[0], gdv[1]
                k = k + 1
                beta = jnp.where(
                    k == 1, 0.0,
                    gamma / jnp.where(g_old == 0.0, 1.0, g_old))
                denom = delta - beta * gamma / a_old
                alpha = gamma / jnp.where(denom == 0.0, 1.0, denom)
                T_new, gd_l = _call_cgs_sweep(T_cur, T_alt, C, beta, alpha,
                                              geo, lam, sf, h_b,
                                              stencil=stencil)
                gdv_new = psum(gd_l[0])
                T_new = _exchange_T_rows(T_new, TR, 3, h_b, axis_name)
                return (T_new, T_cur, gamma, alpha, gdv_new, k)

            T_cur, _, _, _, gdv, k = lax.while_loop(
                cond, body,
                (T, T_alt, jnp.float32(1.0), jnp.float32(1.0), gdv,
                 jnp.int32(0)))
            return unpad_field(T_cur[TX], geo), k, gdv[0]

        # ---- standard CG: prologue + two launches/iteration ----
        # 7-row layout: parity-0 (x, r) at rows 0-1, parity-1 at 3-4
        # (ping-pong keeps tail-band overlap writes idempotent); jacobi
        # adds the single z row (TZ).
        n_rows = 8 if jacobi else 7
        T7 = jnp.zeros((n_rows,) + geo.shape, jnp.float32)
        T7 = T7.at[TX].set(T[TX])
        T7, gd = _call_prologue(T7, F, R0, geo, lam, sf, h_b, with_w0=False)
        T7 = _exchange_T_rows(T7, TR, 1, h_b, axis_name)
        r1_0 = psum(gd[0, 0])

        if jacobi:
            # invd is elementwise-local; its padded ring is zero, so z's
            # ring rows need a real exchange (phase A reads z's ring for
            # the halo-exact p update).
            invd_p = pad_field(jnp.asarray(invd_args[0], jnp.float32), geo)
            T7 = T7.at[TZ].set(invd_p * T7[TR])
            T7 = _exchange_T_rows(T7, TZ, 1, h_b, axis_name)
            r_int = T7[TR, RING:RING + h_b, :]
            z_int = T7[TZ, RING:RING + h_b, :]
            rz_0 = psum(jnp.vdot(r_int, z_int))

            def cond_j(c):
                T7, rz0, rz1, rr, k, par = c
                return (rr > tol_sq) & (k <= max_iter)

            def body_j(c):
                T7, rz0, rz1, rr, k, par = c
                k = k + 1
                beta = jnp.where(k == 1, 0.0,
                                 rz1 / jnp.where(rz0 == 0, 1.0, rz0))
                base_src = 3 * par
                base_dst = 3 * (1 - par)
                p_src = TP0 + par
                p_dst = TP0 + (1 - par)
                # Phase A with the z row as its "r" operand: p = z + beta
                # p — the PCG direction update (solve/cg.py pbody).
                T7, pw_l = _call_std_a(T7, C, beta, p_src, p_dst,
                                       jnp.int32(TZ), geo, lam, sf, h_b,
                                       stencil=stencil)
                pw = psum(pw_l[0, 0])
                alpha = rz1 / jnp.where(pw == 0, 1.0, pw)
                T7 = _exchange_T_rows_dyn(T7, p_dst, h_b, axis_name)
                T7, rzrr_l = _call_std_b_jac(T7, invd_p, alpha, p_dst,
                                             base_src, base_dst, geo, h_b)
                pair = psum(rzrr_l[0])
                # Fresh z ring for the next iteration's phase A (r's ring
                # is never read on the jacobi path).
                T7 = _exchange_T_rows(T7, TZ, 1, h_b, axis_name)
                return (T7, rz1, pair[0], pair[1], k, 1 - par)

            T7, _, _, rr, k, par = lax.while_loop(
                cond_j, body_j,
                (T7, jnp.float32(0.0), rz_0, r1_0, jnp.int32(0),
                 jnp.int32(0)))
            x_fin = lax.dynamic_index_in_dim(T7, 3 * par, axis=0,
                                             keepdims=False)
            return unpad_field(x_fin, geo), k, rr

        def cond(c):
            T7, r0, r1, k, par = c
            return (r1 > tol_sq) & (k <= max_iter)

        def body(c):
            T7, r0, r1, k, par = c
            k = k + 1
            beta = jnp.where(k == 1, 0.0, r1 / jnp.where(r0 == 0, 1.0, r0))
            base_src = 3 * par
            base_dst = 3 * (1 - par)
            p_src = TP0 + par
            p_dst = TP0 + (1 - par)
            r_row = base_src + 1
            T7, pw_l = _call_std_a(T7, C, beta, p_src, p_dst, r_row, geo,
                                   lam, sf, h_b, stencil=stencil)
            pw = psum(pw_l[0, 0])
            alpha = r1 / jnp.where(pw == 0, 1.0, pw)
            # p_dst ring refresh before it becomes next iteration's input.
            T7 = _exchange_T_rows_dyn(T7, p_dst, h_b, axis_name)
            T7, rr_l = _call_std_b(T7, alpha, p_dst, base_src, base_dst,
                                   geo, h_b)
            rr = psum(rr_l[0, 0])
            # Fresh r ring for the next iteration's kernel A.
            T7 = _exchange_T_rows_dyn(T7, base_dst + 1, h_b, axis_name)
            return (T7, r1, rr, k, 1 - par)

        T7, _, r1, k, par = lax.while_loop(
            cond, body, (T7, jnp.float32(0.0), r1_0, jnp.int32(0),
                         jnp.int32(0)))
        x_fin = lax.dynamic_index_in_dim(T7, 3 * par, axis=0,
                                         keepdims=False)
        return unpad_field(x_fin, geo), k, r1

    spec = P(axis_name, None)
    n_in = 18 if jacobi else 17
    fn = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(spec,) * n_in,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    args = (x0, op.P11, op.P12, op.P13, op.P22, op.P23, op.P33,
            op.QB1, op.QB2, op.QB3,
            gm.fwd_x, gm.bwd_x, gm.fwd_y, gm.bwd_y, mask, masks, z0t)
    if jacobi:
        args = args + (invd,)
    return fn(*args)


def _exchange_T_rows_dyn(T, p_row, h_b, axis_name, rows: int = 2):
    """Ring-exchange one dynamically-indexed row of T (the ping-pong p/r
    rows of the standard variant)."""
    R = RING
    sub = lax.dynamic_index_in_dim(T, p_row, axis=0, keepdims=False)
    top_edge = sub[R:R + rows, :]
    bot_edge = sub[R + h_b - rows:R + h_b, :]
    from_above, from_below = _ppermute_updown(top_edge, bot_edge, axis_name)
    sub = lax.dynamic_update_slice(sub, from_above, (R - rows, 0))
    sub = lax.dynamic_update_slice(sub, from_below, (R + h_b, 0))
    return lax.dynamic_update_index_in_dim(T, sub, p_row, axis=0)


def cg_sharded_pallas_std(
    mesh: Mesh,
    axis_name: str,
    x0, op, gm, mask, masks, z0t,
    *, sf: int, lam: float, tol: float = 1e-9, max_iter: int = 100,
    stencil=None, invd=None,
):
    """Standard (two-reduction) sharded CG on the new per-shard kernels:
    in-kernel fromop prologue, tail-band geometry (1080p/8 runs th=64
    instead of the old divisor-constrained th=8), and — for sf <= 2 —
    the collapsed 9-point stencil sweep (``stencil``: None = auto).

    ``invd`` = 1/diag(M) (sharded like x0) switches to Jacobi PCG
    (VERDICT r4 item 4): phase A computes p = z + beta p (the z row fed
    as its r operand), a jacobi phase B additionally produces
    z = invd * r and the fused (rz, rr) pair — same recurrence and
    stopping semantics as the single-chip preconditioned solve.cg, at
    the same 2-collectives-per-iteration cost as plain std."""
    return _run_sharded_pallas(
        mesh, axis_name, x0, op, gm, mask, masks, z0t, sf=sf, lam=lam,
        tol=tol, max_iter=max_iter, variant="std", stencil=stencil,
        invd=invd)
