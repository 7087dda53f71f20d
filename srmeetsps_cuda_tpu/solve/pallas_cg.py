"""Fully fused Pallas TPU conjugate gradient for the depth system.

Why: each CG iteration of the depth solve is ~15 small HLOs in the jnp
path; on TPU v5e that measures ~2.35 ms/iteration on the Mitten grid while
the useful HBM traffic is worth ~0.1 ms — the time goes to intermediate
materialisation and (worst) the reshape-based sf x sf box resample, which
forces lane relayouts. This module fuses one CG iteration into TWO Pallas
kernels, everything VMEM-resident per tile:

  kernel A (direction update + matvec + <p, Mp>):
      p_new = r + beta * p                        (haloed row band)
      g = Dx p_new, h = Dy p_new                  (2-point stencils)
      t1..t3 = Gram-field combinations
      w = ktw * tilesum(p_new) + lam * (Dx' t1 + Dy' t2 - t3)
      pw += sum(p_new * w)                        (SMEM accumulator)

  kernel B (axpy + <r, r>):
      x += alpha * p;  r -= alpha * w;  rr += sum(r * r)

Tiling: FULL-WIDTH ROW BANDS of TH rows. The x-direction stencil is
within-row, so no column halo exists at all; the y-direction stencil needs
a 2-row halo, carried by an 8-row alignment ring (Mosaic requires DMA
slice shapes aligned to the (8, 128) tile, so the logical 2-row halo rides
inside an 8-row ring and row offsets stay multiples of 8). All DMAs are
therefore exactly tile-aligned. VMEM per band at TH=64 is ~14 field rows
of (80, Wp) — about 5.6 MB for a 1280-wide image (supports widths to
~2.8k; wider grids fall back to the jnp path).

Data layout:
  - S = [x, r, w] stacked (3, Hp+16, Wp), updated in place via
    input_output_aliases (kernel A writes only row w; kernel B rows x, r —
    each band touches only its own interior, so aliasing is race-free),
  - p lives in its own (Hp+16, Wp) buffer; kernel A reads the old p (with
    halo) and writes p_new into the donated ping-pong partner buffer —
    no band ever reads a halo another band already overwrote, and only
    interiors are written so the zero alignment ring is preserved forever,
  - F = [P11, P12, P13, P22, P23, P33, fwd_x, bwd_x, fwd_y, bwd_y, ktw]
    stacked (11, Hp+16, Wp), built once per outer iteration.

The sf x sf resample term is expressed in HR layout: KT^T KT v =
ktw * tilesum(v) with ktw = mask * upsample(masks) / sf^4, and tilesum
(aligned per-tile sum replicated back) computed with rolls and phase
selects — no reshapes, no lane relayouts. Shifts are pltpu.roll + iota
masks (Mosaic cannot lower unaligned minor-dim concatenates).

Reference semantics preserved: warm start via residualised rhs, stop on
squared residual <= tol^2, k <= max_iter with the reference's one extra
admitted iteration (devicecalls.cu:229-279).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 8   # alignment ring rows on each side (logical halo is 2)
TH = 64    # default band height; wide grids use smaller bands (pick_th)

# Set True to run the kernels in the Pallas interpreter (CPU testing).
INTERPRET = False

# Trace-time flag restoring the legacy column-masked _shift (see its
# docstring for why masking is dead work). Only interleaved profilers flip
# this, to price the masking in-process; production traces with False.
MASK_COLS = False

# Field indices in the stacked F array.
P11, P12, P13, P22, P23, P33, FX, BX, FY, BY, KTW = range(11)
# Rows in the stacked CG state S.
IX, IR, IW = range(3)


def _shift(a, di, dj):
    """out[i, j] = a[i + di, j + dj] on a ring-banded block (static shifts).

    Circular roll: Mosaic lowers rotates natively, whereas minor-dim
    concatenates of unaligned shapes fail to lower. Neither ROW (sublane)
    nor COLUMN (lane) wraps are masked — both are provably dead work:

    * ROW wraps: every caller operates on a band with an 8-row alignment
      ring whose outermost rows are discarded, and the wrapped garbage
      propagates at most 4 rows through the deepest stencil composition
      (the fromop/CGS prologue's matvec-of-residual), so it never reaches
      an interior row.
    * COLUMN wraps: every dj != 0 call site annihilates the wrapped lanes
      with an exact zero multiply — (a) gradient applications multiply the
      shifted operand by the fwd/bwd mask field, which is 0 in the wrap
      destination column (image edge columns by the reference's
      construction, SRPS.cu:31-46; padding columns by pad_field zeros);
      (b) adjoint applications shift fields already mask-multiplied, so
      the wrap *source* column is an exact 0; (c) _tilesum's internal
      shifts wrap only into columns its own phase selection discards
      (the widest surviving phase-0 column is wp - sf, while shift-by-e
      garbage reaches only columns >= wp - e with e <= sf - 1). Since the
      wrapped values are finite CG state (never Inf/NaN on the padded
      planes), 0 * garbage == 0 and results are bit-identical to the
      masked form. Dropping the per-shift iota+cmp+select saves ~2-3 VPU
      ops x 6 column shifts per element per CG iteration in the
      compute-bound resident kernel (tests/test_pallas_cg.py covers the
      w == wp case where wraps land in real image columns).
    """
    h, w = a.shape
    out = a
    if di:
        out = pltpu.roll(out, (-di) % h, 0)
    if dj:
        out = pltpu.roll(out, (-dj) % w, 1)
        if MASK_COLS:  # measurement-only: the legacy masked form
            jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            valid = (jj < w - dj) if dj > 0 else (jj >= -dj)
            out = jnp.where(valid, out, 0.0)
    return out


def _tilesum(v, sf: int):
    """Per aligned sf x sf tile sum, replicated to every pixel of the tile.

    Shift/select formulation (no reshapes — Mosaic-friendly)."""
    if sf == 1:
        return v

    if sf == 4:
        # Log-step: sliding 4-sum in 2 shifts, then broadcast the phase-0
        # tile sum in 2 shifts (the zeroed non-anchor phases make plain
        # adds equivalent to the select chain) — 8 fewer VPU ops/element
        # than the linear formulation below. Wrap reads only ever combine
        # zeroed phases, so tile alignment (dims % 4 == 0 at every call
        # site) is the lone contract, same as the generic form.
        def axis_sum4(a, axis):
            sh = (lambda x, e: _shift(x, 0, e)) if axis == 1 else (
                lambda x, e: _shift(x, e, 0))
            acc = a + sh(a, 1)
            acc = acc + sh(acc, 2)
            idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
            out = jnp.where(idx % 4 == 0, acc, 0.0)
            out = out + sh(out, -1)
            return out + sh(out, -2)

        return axis_sum4(axis_sum4(v, 1), 0)

    def axis_sum(a, axis):
        h, w = a.shape
        acc = a
        for e in range(1, sf):
            acc = acc + (_shift(a, 0, e) if axis == 1 else _shift(a, e, 0))
        idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)
        phase = idx % sf
        out = jnp.where(phase == 0, acc, 0.0)
        for e in range(1, sf):
            src = _shift(out, 0, -e) if axis == 1 else _shift(out, -e, 0)
            out = jnp.where(phase == e, src, out)
        return out

    return axis_sum(axis_sum(v, 1), 0)


def _cg_kernel_a(beta_ref, S_hbm, p_hbm, p_scratch, F_hbm, p_out, S_out,
                 pw_ref, *, lam: float, sf: int, th: int):
    """p_new = r + beta p; w = M p_new; pw += <p_new, w>. One band/step."""
    i = pl.program_id(0)
    TH = th

    @pl.when(i == 0)
    def _():
        pw_ref[0, 0] = 0.0

    def body(r_buf, p_buf, f_buf, w_buf, sems, out_sems):
        TB = TH + 2 * RING
        cp_r = pltpu.make_async_copy(
            S_hbm.at[IR, pl.ds(i * TH, TB), :], r_buf, sems.at[0])
        cp_p = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * TH, TB), :], p_buf, sems.at[1])
        cp_f = pltpu.make_async_copy(
            F_hbm.at[:, pl.ds(i * TH, TB), :], f_buf, sems.at[2])
        cp_r.start()
        cp_p.start()
        cp_f.start()
        cp_r.wait()
        cp_p.wait()

        beta = beta_ref[0, 0]
        p = r_buf[:] + beta * p_buf[:]
        cp_f.wait()

        f = f_buf
        fwd_x, bwd_x, fwd_y, bwd_y = f[FX], f[BX], f[FY], f[BY]
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

        p_buf[RING:RING + TH, :] = pin
        w_buf[:] = w
        o_p = pltpu.make_async_copy(
            p_buf.at[pl.ds(RING, TH), :],
            p_out.at[pl.ds(i * TH + RING, TH), :],
            out_sems.at[0])
        o_w = pltpu.make_async_copy(
            w_buf,
            S_out.at[IW, pl.ds(i * TH + RING, TH), :],
            out_sems.at[1])
        o_p.start()
        o_w.start()
        pw_ref[0, 0] += jnp.sum(pin * w)
        o_p.wait()
        o_w.wait()

    wp = S_hbm.shape[-1]
    pl.run_scoped(
        body,
        r_buf=pltpu.VMEM((TH + 2 * RING, wp), jnp.float32),
        p_buf=pltpu.VMEM((TH + 2 * RING, wp), jnp.float32),
        f_buf=pltpu.VMEM((11, TH + 2 * RING, wp), jnp.float32),
        w_buf=pltpu.VMEM((TH, wp), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((3,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _cg_kernel_b(alpha_ref, S_hbm, p_hbm, S_out, rr_ref, *, th: int):
    """x += alpha p; r -= alpha w; rr += <r, r>. Interior bands only."""
    i = pl.program_id(0)
    TH = th

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = 0.0

    def body(s_buf, p_buf, sems, out_sem):
        cp_s = pltpu.make_async_copy(
            S_hbm.at[:, pl.ds(i * TH + RING, TH), :], s_buf, sems.at[0])
        cp_p = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * TH + RING, TH), :], p_buf, sems.at[1])
        cp_s.start()
        cp_p.start()
        cp_s.wait()
        cp_p.wait()
        alpha = alpha_ref[0, 0]
        x = s_buf[IX] + alpha * p_buf[:]
        r = s_buf[IR] - alpha * s_buf[IW]
        s_buf[IX] = x
        s_buf[IR] = r
        o = pltpu.make_async_copy(
            s_buf.at[pl.ds(IX, 2)],
            S_out.at[pl.ds(IX, 2), pl.ds(i * TH + RING, TH), :],
            out_sem)
        o.start()
        rr_ref[0, 0] += jnp.sum(r * r)
        o.wait()

    wp = S_hbm.shape[-1]
    pl.run_scoped(
        body,
        s_buf=pltpu.VMEM((3, TH, wp), jnp.float32),
        p_buf=pltpu.VMEM((TH, wp), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA(()),
    )


class PaddedGeometry(NamedTuple):
    h: int
    w: int
    hp: int  # padded interior height (multiple of th)
    wp: int  # padded width (multiple of 128 lanes)
    th: int = TH  # band height for this problem

    @property
    def shape(self):
        return (self.hp + 2 * RING, self.wp)

    @property
    def n_bands(self):
        return self.hp // self.th


def geometry(h: int, w: int, th: int = TH) -> PaddedGeometry:
    hp = -(-h // th) * th
    wp = -(-w // 128) * 128
    return PaddedGeometry(h, w, hp, wp, th)


def _vmem_rows_per_width(th: int, pipelined: bool,
                         jacobi: bool = False) -> int:
    """f32 VMEM rows per unit of padded width a band consumes."""
    tb = th + 2 * RING
    if pipelined:
        # The fromop iteration-0 prologue is the largest scoped block:
        # 2 slots of (x, 8(+1 invd) packed F rows, 4 R0 rows) at TB plus
        # the r output at TH — bigger than phase 0's 2*(10*TB + TH).
        return 2 * ((13 + (1 if jacobi else 0)) * tb + th)
    # single-buffer: r, p, 11 unpacked F rows, w.
    return 13 * tb + th


def pick_th(h: int, w: int, vmem_budget: int = 30 << 20,
            pipelined: bool = True, jacobi: bool = False):
    """Band height with the lowest modelled cost among those whose VMEM
    footprint fits the budget at this width.

    The kernels are DMA-issue-latency-bound on this hardware (measured:
    doubling the streamed bytes costs only +25% time), so FEWER, TALLER
    bands win until the scoped-VMEM limit bites: Mitten th=64 -> 192 is
    -6.7% per CG call. Cost model: processed rows hp (padding included) +
    per-band overhead of ~(2*RING + 14) row-equivalents (ring re-reads +
    measured fixed issue cost). The budget is the 40 MB scoped-vmem limit
    (CompilerParams) divided by the measured ~1.3x model->actual factor.
    RING=8 alignment requires th % 8 == 0 (which also covers the sf in
    {1,2,4} tile constraint). Returns None when even th=8 does not fit
    (>~10k-wide grids pipelined)."""
    wp = -(-w // 128) * 128
    best, best_cost = None, None
    for th in (192, 128, 96, 64, 32, 16, 8):
        if th > max(8, -(-h // 8) * 8):
            continue  # don't run bands taller than the (padded) image
        if _vmem_rows_per_width(th, pipelined, jacobi) * wp * 4 > vmem_budget:
            continue
        hp = -(-h // th) * th
        cost = hp + (2 * RING + 14) * (hp // th)
        if best is None or cost < best_cost:
            best, best_cost = th, cost
    return best


def supported(h: int, w: int, sf: int, vmem_budget: int = 30 << 20,
              pipelined: bool = True, jacobi: bool = False) -> bool:
    """Whether the fused kernels fit this problem (width-driven VMEM, with
    adaptive band height via :func:`pick_th`).

    Also requires a TPU backend (the kernels are Mosaic-compiled; on CPU
    they only run in interpret mode, which tests opt into explicitly).
    """
    import jax

    if not INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    if sf not in (1, 2, 4):
        return False
    return pick_th(h, w, vmem_budget, pipelined, jacobi) is not None


def pad_field(a, geo: PaddedGeometry):
    """(…, h, w) -> (…, hp + 2*RING, wp), zeros in ring + alignment."""
    *lead, h, w = a.shape
    pad = [(0, 0)] * len(lead) + [(RING, geo.hp - h + RING),
                                  (0, geo.wp - w)]
    return jnp.pad(a, pad)


def unpad_field(a, geo: PaddedGeometry):
    return a[..., RING:RING + geo.h, :geo.w]


def stack_fields(op, gm, ktw, geo: PaddedGeometry):
    """Build the (11, Hp + 2*RING, Wp) stacked coefficient array."""
    # pad-per-row-then-stack: see pallas_cg_vmem.stack_fields_rows
    return jnp.stack([pad_field(r, geo) for r in (
        op.P11, op.P12, op.P13, op.P22, op.P23, op.P33,
        gm.fwd_x, gm.bwd_x, gm.fwd_y, gm.bwd_y, ktw,
    )])


def make_ktw(mask, masks, sf: int):
    """mask * upsample(masks) / sf^4 — HR-layout weight of KT^T KT."""
    hl, wl = masks.shape
    up = jnp.broadcast_to(masks[:, None, :, None], (hl, sf, wl, sf)
                          ).reshape(hl * sf, wl * sf)
    return mask * up / float(sf**4)


def _call_kernel_a(S, p, p_alt, F, beta, geo: PaddedGeometry, lam: float,
                   sf: int):
    """p_alt is the ping-pong partner buffer: it is donated and becomes
    p_new. Only band interiors are written, so the zero ring both buffers
    start with is preserved forever — a fresh output buffer would leave
    the ring uninitialised and poison the next iteration's halo reads."""
    grid = (geo.n_bands,)
    kernel = functools.partial(_cg_kernel_a, lam=lam, sf=sf, th=geo.th)
    p_new, S_new, pw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1,1)
            pl.BlockSpec(memory_space=pltpu.HBM),   # S
            pl.BlockSpec(memory_space=pltpu.HBM),   # p (old)
            pl.BlockSpec(memory_space=pltpu.HBM),   # p_alt (donated)
            pl.BlockSpec(memory_space=pltpu.HBM),   # F
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # p_new (= p_alt)
            pl.BlockSpec(memory_space=pltpu.HBM),   # S (aliased, w row)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pw
        ],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(S.shape, S.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={3: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=40 << 20),
        interpret=INTERPRET,
    )(beta, S, p, p_alt, F)
    return p_new, S_new, pw


def _call_kernel_b(S, p, alpha, geo: PaddedGeometry):
    grid = (geo.n_bands,)
    S_new, rr = pl.pallas_call(
        functools.partial(_cg_kernel_b, th=geo.th),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(S.shape, S.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=40 << 20),
        interpret=INTERPRET,
    )(alpha, S, p)
    return S_new, rr


def cg_pallas(
    x0, b_residual, op, gm, ktw, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference-semantics CG on the fused kernels.

    Args mirror models.srps.estimate_depth's matrix-free pieces; ktw from
    :func:`make_ktw`. Returns (x, iterations, final squared residual).
    """
    h, w = x0.shape
    if sf not in (1, 2, 4) or RING % sf:
        raise ValueError(f"unsupported sf for pallas CG: {sf}")
    th = pick_th(h, w, pipelined=False)
    if th is None:
        raise ValueError(f"grid too wide for pallas CG VMEM budget: {w}")
    geo = geometry(h, w, th)
    F = stack_fields(op, gm, ktw, geo)
    S = jnp.stack([
        pad_field(jnp.asarray(x0, jnp.float32), geo),
        pad_field(jnp.asarray(b_residual, jnp.float32), geo),
        jnp.zeros(geo.shape, jnp.float32),
    ])
    p = jnp.zeros(geo.shape, jnp.float32)
    p_alt = jnp.zeros(geo.shape, jnp.float32)
    tol_sq = jnp.float32(tol) ** 2
    r1_0 = jnp.sum(S[IR] * S[IR])

    def cond(carry):
        S, p, p_alt, r0, r1, k = carry
        return (r1 > tol_sq) & (k <= max_iter)

    def body(carry):
        S, p, p_alt, r0, r1, k = carry
        k = k + 1
        beta = jnp.where(k == 1, 0.0, r1 / jnp.where(r0 == 0, 1.0, r0))
        p_new, S, pw = _call_kernel_a(
            S, p, p_alt, F, beta.reshape(1, 1), geo, lam, sf)
        alpha = r1 / jnp.where(pw[0, 0] == 0, 1.0, pw[0, 0])
        S, rr = _call_kernel_b(S, p_new, alpha.reshape(1, 1), geo)
        return S, p_new, p, r1, rr[0, 0], k

    S, p, p_alt, _, r1, k = lax.while_loop(
        cond, body, (S, p, p_alt, jnp.float32(0.0), r1_0, jnp.int32(0)))
    return unpad_field(S[IX], geo), k, r1
