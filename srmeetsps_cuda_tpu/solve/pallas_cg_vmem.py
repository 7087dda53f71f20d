"""Fully VMEM-resident Pallas CG: the whole solve in one launch, zero HBM
traffic in the iteration loop.

The streaming kernels (pallas_cg_pipe) run at the DMA/VPU-latency floor:
every CG iteration re-streams x/r/p/w and the 8 packed coefficient rows
HBM<->VMEM band by band. But a Mitten-class grid's entire CG state fits in
the chip's 128 MB VMEM: 5 state fields (x, r, p ping-pong, w) plus the
8(+1 Jacobi) packed F rows at (Hp+16) x Wp f32 is ~65 MB at 1280x960. This
kernel therefore:

  * allocates the state and coefficient fields as *persistent scratch*
    (``scratch_shapes`` lives across the whole grid, unlike run_scoped),
  * DMAs x0 and F in ONCE (iteration-0 prologue, which also streams the
    4 R0 rows band-by-band straight from HBM to form the initial residual
    in-place — R0 never becomes resident),
  * runs every CG iteration as ONE grid step (no phase split: with
    resident data the alpha barrier is just program order), sweeping
    statically unrolled row bands over the resident refs — pure VPU work,
    no DMA waits, no per-band semaphore traffic,
  * DMAs x back out in a final epilogue step.

Per-iteration arithmetic, band order, and stopping semantics are identical
to pallas_cg_pipe._kernel (same reference quirk k <= max_iter admitting one
extra iteration, devicecalls.cu:229-279; same Jacobi rz recurrence with
<r, r> stopping). The ping-pong p planes preserve the banded halo contract
(band b+1 reads p_old ring rows that band b's interior write would
otherwise have clobbered).

The fused p-update inside sweep A is LOAD-BEARING: hoisting ``p = z +
beta p`` into its own elementwise pass before the matvec sweep (either
whole-plane or banded over interiors), which would drop the ping-pong
plane and both parity selects, measures 51-53 us/CG-iter vs 27.5 for the
fused form on one v5e (tools/profile_sweepv2.py, interleaved,
bit-identical outputs) — the separate scratch pass serializes against
the matvec sweep instead of overlapping with it. Do not "simplify" it.

Geometry gate: (5 + NF) resident fields + compute temporaries must fit
the scoped-VMEM budget — Mitten yes, 1080p no (falls back to the
streaming kernel via estimate_depth's routing).
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
    RING, geometry, pad_field, unpad_field,
    _shift, _tilesum, P11, P12, P13, P22, P23, P33,
    FX as FXR, BX as BXR, FY as FYR, BY as BYR, KTW as KTWR,
)
from .pallas_cg_fused import S_R0, S_R1, S_PW, S_RR, S_ACT, S_BETA, S_ALPHA
from .pallas_cg_pipe import (
    KTW, MB, IVD, S_RR2, _unpack_masks, stack_fields_packed,
)

# In the fully resident mode the gradient masks ride as 4 explicit f32
# rows (the pallas_cg 11-field layout + IVD appended) instead of the
# packed int32 bitfield row: once resident, extra VMEM planes are free,
# and dropping the per-band bitcast/shift/convert unpack removes ~12 VPU
# ops per element from the compute-bound iteration sweep. The streaming
# (hybrid) mode keeps the 8-row packed layout — there the 3 extra rows
# would be re-streamed from HBM every iteration.
IVDR = 11

# Band height for the in-VMEM compute sweeps (bounds temporary liveness;
# bands are statically unrolled so all slicing is static).
TH_V = 64

# Scoped-VMEM budget for the resident kernel (physical VMEM is 128 MB;
# leave headroom for Mosaic's compute temporaries and control state).
VMEM_BUDGET = 100 << 20


def _n_fields(jacobi: bool, rows: bool = False) -> int:
    if rows:
        return 12 if jacobi else 11
    return 9 if jacobi else 8


# Resident coefficient planes of the stencil kernel: the 9-point stencil
# rows, ordered [C0, C+x, C-x, C+y, C-y, C+x+y, C+x-y, C-x+y, C-x-y].
N_STENCIL = 9

# Extra SMEM scalar slot: the exactly-tracked depth energy (see
# _e0_band). scal is widened to (1, 9) in the vmem kernels only.
S_E = 8


def stack_fields_rows(op, gm, ktw, geo, invd=None):
    """(11(+1), Hp+2R, Wp) coefficient stack with unpacked mask rows."""
    rows = [op.P11, op.P12, op.P13, op.P22, op.P23, op.P33,
            gm.fwd_x, gm.bwd_x, gm.fwd_y, gm.bwd_y, ktw]
    if invd is not None:
        rows.append(invd)
    # Pad per row BEFORE stacking: inside the fused outer loop XLA carries
    # the stacked buffer across iterations and in-place-DUSes only the
    # rows that change; stack-then-pad instead re-pads the whole (nf, hp2,
    # wp) stack every iteration (a ~110 MB r+w copy at 960x1280, visible
    # as a standalone `pad` in the while-body HLO).
    return jnp.stack([pad_field(r, geo) for r in rows])


def vmem_th(h: int, w: int) -> int:
    """Sweep band height: TH_V, shrunk for short grids (must divide hp)."""
    hp8 = -(-h // 8) * 8
    return min(TH_V, max(8, hp8))


def vmem_mode(h: int, w: int, sf: int, jacobi: bool = False,
              _check_backend: bool = True):
    """Residency mode this grid supports: ``"full_stencil"`` (state +
    the 9 collapsed stencil coefficient planes resident, built in-kernel
    from the F pack in the it=0 prologue — the cheapest iteration sweep,
    see :func:`_build_c_band`; sf=4 adds a resident ktw plane for the
    un-collapsible KT^T KT tilesum term), ``"full"`` (state +
    coefficient fields all resident with unpacked mask rows, zero HBM
    traffic in the loop), ``"full_packed"`` (same residency, 8-row
    packed-bitmask layout — mid-size grids where the 3 extra mask rows
    don't fit), ``"hybrid"`` (CG state resident, the 8 packed F rows
    re-streamed band-by-band each iteration — 1080p-class grids), or
    ``None`` (too big: streaming kernels)."""
    if (_check_backend and not _pcg.INTERPRET
            and jax.default_backend() not in ("tpu", "axon")):
        return None
    if sf not in (1, 2, 4):
        return None
    th = vmem_th(h, w)
    geo = geometry(h, w, th)
    hp2, wp = geo.shape
    tb = th + 2 * RING
    # prologue band buffer (4 R0 rows) + compute temps ride in the slack
    temps = 16 * tb * wp * 4
    plane = hp2 * wp * 4
    # stencil prologue streams the 11 F rows double-buffered + 4 R0 rows
    # and holds the C-build temporaries
    temps_st = 30 * tb * wp * 4
    # sf=4 keeps KT^T KT out of the collapse (7x7 support) and instead
    # holds the ktw plane resident for a tilesum term in the sweep.
    # jacobi at sf <= 2 runs as plain CG on the symmetrically scaled
    # system (invd folds into the C planes at prologue time — no
    # resident invd plane); only sf=4 keeps the in-sweep PCG form.
    st_planes = (5 + N_STENCIL + (1 if sf == 4 else 0)
                 + (1 if (jacobi and sf == 4) else 0))
    if st_planes * plane + temps_st <= VMEM_BUDGET:
        return "full_stencil"
    if (5 + _n_fields(jacobi, rows=True)) * plane + temps <= VMEM_BUDGET:
        return "full"
    if (5 + _n_fields(jacobi)) * plane + temps <= VMEM_BUDGET:
        return "full_packed"
    state = (5 + (1 if jacobi else 0)) * plane
    # stencil-hybrid: state resident, the 9 C rows (built once into an
    # HBM scratch by the prologue) re-streamed interior-only per band —
    # fewer bytes AND ~1/4 the arithmetic of the packed-F hybrid.
    cwin = 2 * N_STENCIL * th * wp * 4
    ktw_plane = plane if sf == 4 else 0
    if state + ktw_plane + cwin + temps_st <= VMEM_BUDGET:
        return "hybrid_stencil"
    fbuf = 2 * 8 * tb * wp * 4
    if state + fbuf + temps <= VMEM_BUDGET:
        return "hybrid"
    return None


def supported_vmem(h: int, w: int, sf: int, jacobi: bool = False) -> bool:
    """Whether a resident kernel (full or hybrid) fits this grid."""
    return vmem_mode(h, w, sf, jacobi) is not None


def _band_masks(f, rows: bool):
    """The 4 gradient masks of one banded F block: explicit f32 rows in
    the unpacked layout, a bitfield unpack in the packed one."""
    if rows:
        return f[FXR], f[BXR], f[FYR], f[BYR]
    return _unpack_masks(f[MB])


def _matvec_band(x, f, lam: float, sf: int, th: int, rows: bool = False):
    """w = M x on one ring-banded block; returns (interior w, x interior).

    Identical arithmetic to pallas_cg_pipe._kernel's phase-0 body."""
    fwd_x, bwd_x, fwd_y, bwd_y = _band_masks(f, rows)
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
    xin = x[RING:RING + th, :]
    ktt = f[KTWR if rows else KTW, RING:RING + th, :] * _tilesum(xin, sf)
    grad = (dxt + dyt - t3)[RING:RING + th, :]
    # lam is a trace-time Python float; at the reference default 1.0 the
    # multiply is an exact no-op — skip emitting it.
    w = ktt + (grad if lam == 1.0 else lam * grad)
    return w, xin


def _build_c_band(f, lam: float, sf: int, th: int, shift=_shift):
    """One band of the 9-point stencil collapse of ``M = KT^T KT +
    lam A^T A``: returns the (9, th, wp) interior coefficient rows
    ``[C0, C+x, C-x, C+y, C-y, C+x+y, C+x-y, C-x+y, C-x-y]`` with
    ``(M v)[i] = sum_d C_d[i] * v[i + d]``.

    Expanding ``Dx' P Dx``-type products with the exclusive fwd/bwd
    gradient masks (a*b = 0, a^2 = a, SRPS.cu:31-46 semantics) kills all
    +-2 offsets, so A^T A has exactly 3x3 support; for sf <= 2 the box
    resample's tile mates also lie within +-1, so KT^T KT (phase-split
    ktw) and the trace-time ``lam`` fold into the same 9 planes. Column
    wraps of the lane shifts read exact zeros (edge masks vanish in the
    wrap source column — same dead-wrap contract as _shift's docstring),
    and because ax=0 on the last masked column / bx=0 on the first, the
    built C is exactly 0 wherever an x-neighbor read would wrap, keeping
    the iteration sweep roll-only with no masking.

    For sf == 4 the tile mates span +-3 offsets (a 7x7 support — 49
    planes would cost more than it saves), so only ``lam A^T A`` is
    collapsed and the caller applies the KT^T KT term separately as
    ``ktw * tilesum(v)`` against a resident ktw plane (see
    :func:`_kernel_vmem_stencil`).
    """
    assert sf in (1, 2, 4)
    R = RING
    sl = slice(R, R + th)
    P11_, P12_, P13_ = f[P11], f[P12], f[P13]
    P22_, P23_, P33_ = f[P22], f[P23], f[P33]
    ax, bx, ay, by = f[FXR], f[BXR], f[FYR], f[BYR]
    cx = ax - bx
    cy = ay - by
    # one-sided mask-folded field combinations (E: x-direction, F: y)
    E1 = ax * (P11_ + cy * P12_ + P13_)
    E2 = bx * (P11_ - cy * P12_ - P13_)
    F1 = ay * (P22_ + cx * P12_ + P23_)
    F2 = by * (P22_ - cx * P12_ - P23_)
    paa = ax * ay * P12_
    pab = ax * by * P12_
    pba = bx * ay * P12_
    pbb = bx * by * P12_
    # Sh(f, +ex)[i] = f[i+ex] = shift(f, 0, 1); +ey = shift(f, 1, 0).
    cpe = -(E1 + shift(E2, 0, 1))
    cme = -(shift(E1, 0, -1) + E2)
    cpy = -(F1 + shift(F2, 1, 0))
    cmy = -(shift(F1, -1, 0) + F2)
    cpp = -(shift(pba, 0, 1) + shift(pab, 1, 0))
    cpm = shift(pbb, 0, 1) + shift(paa, -1, 0)
    cmp_ = shift(paa, 0, -1) + shift(pbb, 1, 0)
    cmm = -(shift(pab, 0, -1) + shift(pba, -1, 0))
    c0 = (shift(ax * P11_, 0, -1) + (ax + bx) * P11_
          + shift(bx * P11_, 0, 1)
          + shift(ay * P22_, -1, 0) + (ay + by) * P22_
          + shift(by * P22_, 1, 0)
          + 2.0 * (cx * cy * P12_ + cx * P13_ + cy * P23_) + P33_)
    cs = [c0, cpe, cme, cpy, cmy, cpp, cpm, cmp_, cmm]
    cs = [c[sl] for c in cs]
    if lam != 1.0:
        cs = [lam * c for c in cs]
    if sf == 4:
        return jnp.stack(cs)
    # Fold KT^T KT: for sf=2 a pixel's tile mates sit at the offsets its
    # even/odd row/col phases select (RING is even and the width pad is
    # trailing, so padded-plane phases equal image phases).
    ktw = f[KTWR, sl, :]
    if sf == 1:
        cs[0] = cs[0] + ktw
    else:
        wp = ktw.shape[-1]
        jj = lax.broadcasted_iota(jnp.int32, (th, wp), 1)
        ii = lax.broadcasted_iota(jnp.int32, (th, wp), 0)
        pxe = jj % 2 == 0
        pye = ii % 2 == 0
        zero = jnp.zeros_like(ktw)
        kxe = jnp.where(pxe, ktw, zero)
        kxo = ktw - kxe
        cs[0] = cs[0] + ktw
        cs[1] = cs[1] + kxe
        cs[2] = cs[2] + kxo
        cs[3] = cs[3] + jnp.where(pye, ktw, zero)
        cs[4] = cs[4] + jnp.where(pye, zero, ktw)
        cs[5] = cs[5] + jnp.where(pye, kxe, zero)
        cs[6] = cs[6] + jnp.where(pye, zero, kxe)
        cs[7] = cs[7] + jnp.where(pye, kxo, zero)
        cs[8] = cs[8] + jnp.where(pye, zero, kxo)
    return jnp.stack(cs)


def _e0_band(x, f, q, zu, lam: float, sf: int, th: int,
             rows: bool = False):
    """Well-conditioned depth energy at the warm start, one band.

    ``E(x0) = ||KT x0 - z0s||^2 + lam * (x0'A'A x0 - 2 x0'A'B)`` with the
    caller adding the x-independent ``lam * sum B^2`` (= op.const). The
    direct quadratic identity ``x'Mx - 2x'rhs`` is unusable in f32 (the
    two dots are ~1e10 while E is ~1e4 on real depths — measured 684
    absolute error at Mitten scale), so each term is evaluated in its
    per-pixel residual form, matching srps.depth_energy's conditioning:

    * data term: P/QB-weighted quadratics of (g, h, x) per pixel;
    * KT term: the LR residual replicated onto the HR grid against the
      ``up(masks)`` / ``up(masks * z0s)`` planes (``zu`` rows 0/1), every
      HR pixel of a tile carrying the tile residual, summed / sf^2.

    The per-iteration update is then the CG identity
    ``E(x + alpha p) = E(x) + alpha^2 <p, Mp> - 2 alpha <p, r>`` with
    ``<p, r> = <z, r>`` (local orthogonality ``<p_old, r> = 0``), i.e.
    ``E -= alpha * r1`` — pure SMEM scalar math on dots the sweep
    already computes, no extra band passes. (A literal per-band
    ``<p, r>`` dot was measured ~2 ms/outer-iter slower and only ~2x
    more accurate on a cond-1e8 synthetic — 0.13% vs 0.26% after 101
    f32 iterations; devicecalls.cu:762-767 recomputes the energy with
    two SpMVs instead.)"""
    fwd_x, bwd_x, fwd_y, bwd_y = _band_masks(f, rows)
    g = fwd_x * (_shift(x, 0, 1) - x) + bwd_x * (x - _shift(x, 0, -1))
    h = fwd_y * (_shift(x, 1, 0) - x) + bwd_y * (x - _shift(x, -1, 0))
    sl = slice(RING, RING + th)
    g, h, xin = g[sl], h[sl], x[sl]
    quad = (f[P11, sl, :] * g * g + f[P22, sl, :] * h * h
            + f[P33, sl, :] * xin * xin
            + 2.0 * (f[P12, sl, :] * g * h - f[P13, sl, :] * g * xin
                     - f[P23, sl, :] * h * xin))
    lin = q[0, sl, :] * g + q[1, sl, :] * h - q[2, sl, :] * xin
    edata = jnp.sum(quad - 2.0 * lin)
    t = _tilesum(xin, sf) * (1.0 / (sf * sf))
    rkt = zu[0, sl, :] * t - zu[1, sl, :]
    ekt = jnp.sum(rkt * rkt) * (1.0 / (sf * sf))
    return ekt + (edata if lam == 1.0 else lam * edata)


def energy_planes(masks, z0s, mask_shape, sf: int):
    """The two loop-invariant HR planes the kernels' energy prologue
    streams: ``up(masks)`` and ``up(masks * z0s)``, padded to the vmem
    geometry. Built once per problem (srps.build_problem)."""
    from ..ops.grid import box_upsample_adjoint

    h, w = mask_shape
    geo = geometry(h, w, vmem_th(h, w))
    s2 = float(sf * sf)
    u1 = box_upsample_adjoint(jnp.asarray(masks, jnp.float32), sf) * s2
    u2 = box_upsample_adjoint(
        jnp.asarray(z0s, jnp.float32) * masks, sf) * s2
    return jnp.stack([pad_field(u1, geo), pad_field(u2, geo)])


# Trace-time switch for the _stencil_w row addressing: True (default)
# replaces the 6 sublane rolls with static row slices of the ring-banded
# block — bit-identical values (rows R+di..R+di+th exist for di in
# {-1,0,1} since RING >= 1 and the block has th + 2*RING rows), cheaper
# Mosaic lowering: 13.6/13.9 vs 14.3/14.9 us/CG-iter over two
# interleaved runs (tools/profile_sweepslice.py, marginal cap
# differencing; hw solutions bit-identical). False restores the roll
# form for measurement.
SLICE_ROWS = True


def _stencil_w(p, c, th: int):
    """``w = M p`` on one ring-banded block via the resident 9-point
    stencil: 2 lane rolls + 6 static row reads + 9 multiply-adds — no
    mask algebra, no tilesum, no lam multiply (all folded into ``c``)."""
    R = RING
    sl = slice(R, R + th)
    pe = _shift(p, 0, 1)
    pw = _shift(p, 0, -1)
    if SLICE_ROWS:
        row = lambda a, di: a[R + di:R + di + th]  # noqa: E731
        return (c[0] * p[sl] + c[1] * pe[sl] + c[2] * pw[sl]
                + c[3] * row(p, 1) + c[4] * row(p, -1)
                + c[5] * row(pe, 1) + c[6] * row(pe, -1)
                + c[7] * row(pw, 1) + c[8] * row(pw, -1))
    return (c[0] * p[sl] + c[1] * pe[sl] + c[2] * pw[sl]
            + c[3] * _shift(p, 1, 0)[sl] + c[4] * _shift(p, -1, 0)[sl]
            + c[5] * _shift(pe, 1, 0)[sl] + c[6] * _shift(pe, -1, 0)[sl]
            + c[7] * _shift(pw, 1, 0)[sl] + c[8] * _shift(pw, -1, 0)[sl])


def _scale_c_band(c_band, s, th: int):
    """Symmetric diagonal scaling of one 9-plane stencil band:
    ``C'_d[i] = s[i] * C_d[i] * s[i+d]`` with ``s = sqrt(invd) =
    D^{-1/2}`` on the ring-extended band. Cross-boundary offsets are
    safe: C_d is built exactly 0 wherever the neighbour read would be
    invalid, and s is 0 only in the zero-padded frame where C is 0 too."""
    R = RING
    sl = slice(R, R + th)
    se = _shift(s, 0, 1)
    sw = _shift(s, 0, -1)
    mates = [s, se, sw, _shift(s, 1, 0), _shift(s, -1, 0),
             _shift(se, 1, 0), _shift(se, -1, 0),
             _shift(sw, 1, 0), _shift(sw, -1, 0)]
    s_in = s[sl]
    return jnp.stack([s_in * c_band[d] * mates[d][sl]
                      for d in range(N_STENCIL)])


def _kernel_vmem_stencil(consts_ref, X_hbm, F_hbm, R0_hbm, Z0U_hbm,
                         X_out, iters_ref, r1_ref, e_ref,
                         *refs, lam: float, sf: int, n_bands: int, th: int,
                         jacobi: bool, track_e: bool = False,
                         scaled: bool = False):
    """Stencil-resident CG: same grid/step structure, bookkeeping, and
    stopping semantics as :func:`_kernel_vmem`, but the iteration sweeps
    apply ``M`` through 9 resident collapsed coefficient planes that the
    it=0 prologue builds in-kernel from the streamed 11(+1)-row F pack
    (:func:`_build_c_band`) — the per-element cost of sweep A drops from
    ~40 VPU ops + 8 rolls (mask-gated gradient/adjoint chain + tilesum)
    to 9 multiply-adds + 8 rolls. For sf == 4 the KT^T KT term does not
    fold into 9 planes (7x7 tile support); it is applied per sweep as
    ``ktw * tilesum(p)`` against one extra resident ktw plane — still
    far cheaper than the direct kernel's full mask-gated chain.

    ``scaled=True`` (requires ``jacobi=False``, sf <= 2): Jacobi PCG as
    plain CG on the symmetrically scaled system ``M' = S M S`` with
    ``S = diag(sqrt(invd))`` — algebraically the same alpha/beta/iterate
    sequence as PCG with the diagonal preconditioner, but the scaling
    folds into the 9 resident planes at prologue time (``C'_d[i] =
    s_i C_d[i] s_{i+d}``), so EVERY iteration sweep is the plain
    9-FMA sweep: no resident invd plane, no per-iteration z = invd*r
    multiply, no second (rz) reduction — the round-5 fix for the
    measured ~2.4x jacobi-sweep cost. The kernel iterates the scaled
    CORRECTION ``y`` from 0 (r0' = s*(rhs - M x0)); the epilogue emits
    ``x = x0 + s*y`` band-by-band. Stopping uses the scaled residual
    ``<r', r'> = <r, invd r>`` (= PCG's rz) rather than PCG's plain
    <r,r> — at the reference tol (1e-9 squared, unreachable in f32)
    both run to the cap identically. The energy identity carries over
    unchanged: the quadratic is invariant under the substitution and
    ``E -= alpha * <p', r'>`` = ``E -= alpha * r1``."""
    assert not (scaled and jacobi)
    assert not scaled or sf in (1, 2)
    refs = list(refs)
    xv, rv, p0v, p1v, wv, cv = refs[:6]
    i_r = 6
    ktwv = None
    if sf == 4:
        ktwv = refs[i_r]
        i_r += 1
    ivdv = None
    if jacobi:
        ivdv = refs[i_r]
        i_r += 1
    scal, sems = refs[i_r], refs[i_r + 1]
    TH = th
    TB = TH + 2 * RING
    NFR = 12 if scaled else 11  # scaled streams the invd row too
    lane = pl.program_id(0)
    it = pl.program_id(1)
    n_it = pl.num_programs(1)
    tol_sq = consts_ref[lane, 0]
    max_iter = consts_ref[lane, 2]

    # ------ it == 0: load state, build resident C, r0 prologue ----------
    @pl.when(it == 0)
    def _():
        scal[0, S_R0] = 0.0
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0

        cp_x = pltpu.make_async_copy(X_hbm.at[lane], xv, sems.at[2])
        cp_x.start()
        if jacobi:
            cp_i = pltpu.make_async_copy(F_hbm.at[lane, IVDR], ivdv,
                                         sems.at[3])
            cp_i.start()
        if ktwv is not None:
            cp_k = pltpu.make_async_copy(F_hbm.at[lane, KTWR], ktwv,
                                         sems.at[0])
            cp_k.start()
        zero = jnp.zeros_like(p0v)
        p0v[...] = zero
        p1v[...] = zero
        wv[...] = zero
        rv[...] = zero
        # ring + padding rows of C must be exact zeros (the sweeps read
        # only interior C rows, but zeros keep any future epilogue safe)
        cv[...] = jnp.zeros_like(cv)
        cp_x.wait()
        if jacobi:
            cp_i.wait()
        if ktwv is not None:
            cp_k.wait()

        def body(fb, q_buf, fsem, qsem, zu_buf=None, zsem=None):
            def f_copy(b, cur):
                return pltpu.make_async_copy(
                    F_hbm.at[lane, pl.ds(0, NFR), pl.ds(b * TH, TB), :],
                    fb.at[cur], fsem.at[cur])

            rr = jnp.float32(0.0)
            rz = jnp.float32(0.0)
            e0 = jnp.float32(0.0)
            f_copy(0, 0).start()
            for b in range(n_bands):
                cur = b % 2
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).start()
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).start()
                if b + 1 < n_bands:
                    f_copy(b + 1, 1 - cur).start()
                f_copy(b, cur).wait()
                f = fb.at[cur]
                c_band = _build_c_band(f, lam, sf, TH)
                sl_i = slice(b * TH + RING, b * TH + RING + TH)
                x = xv[b * TH:b * TH + TB, :]
                # w = M x0 with the UNSCALED stencil (x0 is in original
                # variables); the resident C then stores the scaled form.
                w = _stencil_w(x, c_band, TH)
                if scaled:
                    s_band = jnp.sqrt(f[IVDR])
                    cv[:, sl_i, :] = _scale_c_band(c_band, s_band, TH)
                else:
                    cv[:, sl_i, :] = c_band
                if sf == 4:
                    xin = x[RING:RING + TH, :]
                    w = w + f[KTWR, RING:RING + TH, :] * _tilesum(xin, sf)
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).wait()
                q = q_buf
                fwd_x, bwd_x, fwd_y, bwd_y = (f[FXR], f[BXR], f[FYR],
                                              f[BYR])
                q1 = fwd_x * q[0]
                q1b = bwd_x * q[0]
                dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
                q2 = fwd_y * q[1]
                q2b = bwd_y * q[1]
                dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
                gq = (dxq + dyq - q[2])[RING:RING + TH, :]
                rhs = q[3, RING:RING + TH, :] + (
                    gq if lam == 1.0 else lam * gq)
                r = rhs - w
                if scaled:
                    r = s_band[RING:RING + TH, :] * r
                rv[sl_i, :] = r
                rr = rr + jnp.sum(r * r)
                if jacobi:
                    rz = rz + jnp.sum(r * r * ivdv[sl_i, :])
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).wait()
                    e0 = e0 + _e0_band(x, f, q_buf, zu_buf, lam, sf, TH,
                                       rows=True)
            scal[0, S_R1] = rz if jacobi else rr
            if jacobi:
                scal[0, S_RR2] = rr
            if track_e:
                scal[0, S_E] = e0
            r1_ref[lane, 0] = rr

        pl.run_scoped(
            body,
            fb=pltpu.VMEM((2, NFR, TB, X_hbm.shape[-1]), jnp.float32),
            q_buf=pltpu.VMEM((4, TB, X_hbm.shape[-1]), jnp.float32),
            fsem=pltpu.SemaphoreType.DMA((2,)),
            qsem=pltpu.SemaphoreType.DMA(()),
            **(dict(zu_buf=pltpu.VMEM((2, TB, X_hbm.shape[-1]),
                                      jnp.float32),
                    zsem=pltpu.SemaphoreType.DMA(())) if track_e else {}),
        )
        if scaled:
            # Iterate the scaled CORRECTION from 0; x0 stays in X_hbm
            # for the epilogue's x = x0 + s*y reconstruction.
            xv[...] = jnp.zeros_like(xv)

    # ---------------- iteration steps --------------------------------
    is_iter = (it >= 1) & (it < n_it - 1)

    @pl.when(is_iter)
    def _():
        r1 = scal[0, S_R1]
        stop_dot = scal[0, S_RR2] if jacobi else r1
        active = jnp.where(
            (stop_dot > tol_sq)
            & ((it - 1).astype(jnp.float32) <= max_iter),
            scal[0, S_ACT], 0.0)
        scal[0, S_ACT] = active
        scal[0, S_BETA] = jnp.where(
            it == 1, 0.0,
            r1 / jnp.where(scal[0, S_R0] == 0.0, 1.0, scal[0, S_R0]))

        @pl.when(active > 0.0)
        def _():
            iters_ref[lane, 0] += 1.0

    active = (scal[0, S_ACT] > 0.0) & is_iter

    @pl.when(active)
    def _():
        beta = scal[0, S_BETA]
        par = lax.rem(it - 1, 2)

        # sweep A: p = z + beta p (ping-pong), w = C-stencil p, pw = <p, w>
        # (track_e's energy update is scalar-only, see _e0_band)
        pw = jnp.float32(0.0)
        for b in range(n_bands):
            sl_b = slice(b * TH, b * TH + TB)
            r = rv[sl_b, :]
            p_old = jnp.where(par == 0, p0v[sl_b, :], p1v[sl_b, :])
            if jacobi:
                z = r * ivdv[sl_b, :]
            else:
                z = r
            p = z + beta * p_old
            sl_i = slice(b * TH + RING, b * TH + RING + TH)
            pin = p[RING:RING + TH, :]
            w = _stencil_w(p, cv[:, sl_i, :], TH)
            if sf == 4:
                w = w + ktwv[sl_i, :] * _tilesum(pin, sf)

            @pl.when(par == 0)
            def _():
                p1v[sl_i, :] = pin

            @pl.when(par == 1)
            def _():
                p0v[sl_i, :] = pin

            wv[sl_i, :] = w
            pw = pw + jnp.sum(pin * w)
        scal[0, S_PW] = pw
        alpha = scal[0, S_R1] / jnp.where(pw == 0.0, 1.0, pw)
        scal[0, S_ALPHA] = alpha
        if track_e:
            scal[0, S_E] = scal[0, S_E] - alpha * scal[0, S_R1]

        # sweep B: x += alpha p_new; r -= alpha w; rr = <r, r>
        rr = jnp.float32(0.0)
        rz = jnp.float32(0.0)
        for b in range(n_bands):
            sl_i = slice(b * TH + RING, b * TH + RING + TH)
            p_new = jnp.where(par == 0, p1v[sl_i, :], p0v[sl_i, :])
            x = xv[sl_i, :] + alpha * p_new
            r = rv[sl_i, :] - alpha * wv[sl_i, :]
            xv[sl_i, :] = x
            rv[sl_i, :] = r
            rr = rr + jnp.sum(r * r)
            if jacobi:
                rz = rz + jnp.sum(r * r * ivdv[sl_i, :])
        scal[0, S_R0] = scal[0, S_R1]
        scal[0, S_R1] = rz if jacobi else rr
        if jacobi:
            scal[0, S_RR2] = rr
        r1_ref[lane, 0] = rr

    # ------- epilogue: write x back + the tracked energy ---------------
    @pl.when(it == n_it - 1)
    def _():
        e_ref[lane, 0] = scal[0, S_E] if track_e else jnp.float32(0.0)
        if not scaled:
            cp = pltpu.make_async_copy(xv, X_out.at[lane], sems.at[2])
            cp.start()
            cp.wait()
        else:
            # x = x0 + sqrt(invd) * y, band-by-band (x0 re-streamed from
            # the untouched X input, invd from the F pack row; only
            # interior rows are emitted — unpad_field drops the ring).
            # The same pass reconstructs the PLAIN final residual norm
            # <r, r> = sum(r'^2 / invd) for report parity with PCG
            # (iterations tracked the scaled <r', r'>; invd is clamped
            # positive by depth_diag, and r' = 0 wherever the zero
            # padding makes invd 0).
            def epi(x0b, ivb, ob, isem, osem):
                rr = jnp.float32(0.0)
                for b in range(n_bands):
                    sl_i = slice(b * TH + RING, b * TH + RING + TH)
                    cp_x0 = pltpu.make_async_copy(
                        X_hbm.at[lane, pl.ds(b * TH + RING, TH), :],
                        x0b, isem.at[0])
                    cp_iv = pltpu.make_async_copy(
                        F_hbm.at[lane, IVDR, pl.ds(b * TH + RING, TH), :],
                        ivb, isem.at[1])
                    cp_x0.start()
                    cp_iv.start()
                    cp_x0.wait()
                    cp_iv.wait()
                    ob[...] = x0b[...] + jnp.sqrt(ivb[...]) * xv[sl_i, :]
                    rp = rv[sl_i, :]
                    rr = rr + jnp.sum(jnp.where(
                        ivb[...] > 0.0, rp * rp / ivb[...], 0.0))
                    cp_o = pltpu.make_async_copy(
                        ob, X_out.at[lane, pl.ds(b * TH + RING, TH), :],
                        osem)
                    cp_o.start()
                    cp_o.wait()
                r1_ref[lane, 0] = rr

            pl.run_scoped(
                epi,
                x0b=pltpu.VMEM((TH, X_hbm.shape[-1]), jnp.float32),
                ivb=pltpu.VMEM((TH, X_hbm.shape[-1]), jnp.float32),
                ob=pltpu.VMEM((TH, X_hbm.shape[-1]), jnp.float32),
                isem=pltpu.SemaphoreType.DMA((2,)),
                osem=pltpu.SemaphoreType.DMA(()),
            )


def _kernel_vmem_hybrid_stencil(consts_ref, X_hbm, F_hbm, R0_hbm, Z0U_hbm,
                                X_out, iters_ref, r1_ref, e_ref, C_hbm,
                                *refs, lam: float, sf: int, n_bands: int,
                                th: int, jacobi: bool,
                                track_e: bool = False):
    """Stencil-hybrid residency (1080p-class): CG state stays in
    VMEM across the whole solve; the it=0 prologue streams the 11(+1)-row
    F pack band-by-band, builds the 9 collapsed stencil rows
    (:func:`_build_c_band`), and writes them to the ``C_hbm`` scratch
    output; every iteration then re-streams ONLY the 9 interior C rows
    per band (9*TH rows vs the packed-F hybrid's 8*(TH+2R)) and applies
    the matvec as 9 multiply-adds — less DMA and ~1/4 the arithmetic.
    sf == 4 adds a resident ktw plane for the un-collapsible KT^T KT
    tilesum term (see :func:`_kernel_vmem_stencil`)."""
    refs = list(refs)
    xv, rv, p0v, p1v, wv, cb = refs[:6]
    i_r = 6
    ktwv = None
    if sf == 4:
        ktwv = refs[i_r]
        i_r += 1
    ivdv = None
    if jacobi:
        ivdv = refs[i_r]
        i_r += 1
    scal, sems = refs[i_r], refs[i_r + 1]
    TH = th
    TB = TH + 2 * RING
    lane = pl.program_id(0)
    it = pl.program_id(1)
    n_it = pl.num_programs(1)
    tol_sq = consts_ref[lane, 0]
    max_iter = consts_ref[lane, 2]

    def _c_in_copy(b, cur):
        return pltpu.make_async_copy(
            C_hbm.at[lane, :, pl.ds(b * TH, TH), :], cb.at[cur],
            sems.at[cur])

    # ------ it == 0: load state, build C -> HBM scratch, r0 prologue ----
    @pl.when(it == 0)
    def _():
        scal[0, S_R0] = 0.0
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0

        cp_x = pltpu.make_async_copy(X_hbm.at[lane], xv, sems.at[2])
        cp_x.start()
        if jacobi:
            cp_i = pltpu.make_async_copy(F_hbm.at[lane, IVDR], ivdv,
                                         sems.at[3])
            cp_i.start()
        if ktwv is not None:
            # sems 0/1 are the iteration-step C stream; balanced reuse
            # within the prologue step is safe.
            cp_k = pltpu.make_async_copy(F_hbm.at[lane, KTWR], ktwv,
                                         sems.at[0])
            cp_k.start()
        zero = jnp.zeros_like(p0v)
        p0v[...] = zero
        p1v[...] = zero
        wv[...] = zero
        rv[...] = zero
        cp_x.wait()
        if jacobi:
            cp_i.wait()
        if ktwv is not None:
            cp_k.wait()

        def body(fb, q_buf, fsem, qsem, osem, zu_buf=None, zsem=None):
            def f_copy(b, cur):
                return pltpu.make_async_copy(
                    F_hbm.at[lane, pl.ds(0, 11), pl.ds(b * TH, TB), :],
                    fb.at[cur], fsem.at[cur])

            def c_out_copy(b, cur):
                return pltpu.make_async_copy(
                    cb.at[cur], C_hbm.at[lane, :, pl.ds(b * TH, TH), :],
                    osem.at[cur])

            rr = jnp.float32(0.0)
            rz = jnp.float32(0.0)
            e0 = jnp.float32(0.0)
            f_copy(0, 0).start()
            for b in range(n_bands):
                cur = b % 2
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).start()
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).start()
                if b + 1 < n_bands:
                    f_copy(b + 1, 1 - cur).start()
                f_copy(b, cur).wait()
                f = fb.at[cur]
                c_band = _build_c_band(f, lam, sf, TH)
                if b >= 2:
                    # slot reused: the copy-out from band b-2 must land
                    c_out_copy(b - 2, cur).wait()
                cb[cur] = c_band
                c_out_copy(b, cur).start()
                x = xv[b * TH:b * TH + TB, :]
                w = _stencil_w(x, c_band, TH)
                if sf == 4:
                    xin = x[RING:RING + TH, :]
                    w = w + f[KTWR, RING:RING + TH, :] * _tilesum(xin, sf)
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).wait()
                q = q_buf
                fwd_x, bwd_x, fwd_y, bwd_y = (f[FXR], f[BXR], f[FYR],
                                              f[BYR])
                q1 = fwd_x * q[0]
                q1b = bwd_x * q[0]
                dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
                q2 = fwd_y * q[1]
                q2b = bwd_y * q[1]
                dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
                gq = (dxq + dyq - q[2])[RING:RING + TH, :]
                rhs = q[3, RING:RING + TH, :] + (
                    gq if lam == 1.0 else lam * gq)
                r = rhs - w
                sl_i = slice(b * TH + RING, b * TH + RING + TH)
                rv[sl_i, :] = r
                rr = rr + jnp.sum(r * r)
                if jacobi:
                    rz = rz + jnp.sum(r * r * ivdv[sl_i, :])
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).wait()
                    e0 = e0 + _e0_band(x, f, q_buf, zu_buf, lam, sf, TH,
                                       rows=True)
            # drain the last (up to) two outstanding C copies
            for b in (n_bands - 2, n_bands - 1):
                if b >= 0:
                    c_out_copy(b, b % 2).wait()
            scal[0, S_R1] = rz if jacobi else rr
            if jacobi:
                scal[0, S_RR2] = rr
            if track_e:
                scal[0, S_E] = e0
            r1_ref[lane, 0] = rr

        pl.run_scoped(
            body,
            fb=pltpu.VMEM((2, 11, TB, X_hbm.shape[-1]), jnp.float32),
            q_buf=pltpu.VMEM((4, TB, X_hbm.shape[-1]), jnp.float32),
            fsem=pltpu.SemaphoreType.DMA((2,)),
            qsem=pltpu.SemaphoreType.DMA(()),
            osem=pltpu.SemaphoreType.DMA((2,)),
            **(dict(zu_buf=pltpu.VMEM((2, TB, X_hbm.shape[-1]),
                                      jnp.float32),
                    zsem=pltpu.SemaphoreType.DMA(())) if track_e else {}),
        )

    # ---------------- iteration steps --------------------------------
    is_iter = (it >= 1) & (it < n_it - 1)

    @pl.when(is_iter)
    def _():
        r1 = scal[0, S_R1]
        stop_dot = scal[0, S_RR2] if jacobi else r1
        active = jnp.where(
            (stop_dot > tol_sq)
            & ((it - 1).astype(jnp.float32) <= max_iter),
            scal[0, S_ACT], 0.0)
        scal[0, S_ACT] = active
        scal[0, S_BETA] = jnp.where(
            it == 1, 0.0,
            r1 / jnp.where(scal[0, S_R0] == 0.0, 1.0, scal[0, S_R0]))

        @pl.when(active > 0.0)
        def _():
            iters_ref[lane, 0] += 1.0

    active = (scal[0, S_ACT] > 0.0) & is_iter

    @pl.when(active)
    def _():
        beta = scal[0, S_BETA]
        par = lax.rem(it - 1, 2)

        # sweep A: p = z + beta p (ping-pong), w = C-stencil p, pw;
        # C interior bands stream in double-buffered under the compute.
        # (track_e's energy update is scalar-only, see _e0_band)
        pw = jnp.float32(0.0)
        _c_in_copy(0, 0).start()
        for b in range(n_bands):
            cur = b % 2
            if b + 1 < n_bands:
                _c_in_copy(b + 1, 1 - cur).start()
            _c_in_copy(b, cur).wait()
            sl_b = slice(b * TH, b * TH + TB)
            r = rv[sl_b, :]
            p_old = jnp.where(par == 0, p0v[sl_b, :], p1v[sl_b, :])
            if jacobi:
                z = r * ivdv[sl_b, :]
            else:
                z = r
            p = z + beta * p_old
            pin = p[RING:RING + TH, :]
            w = _stencil_w(p, cb[cur], TH)
            sl_i = slice(b * TH + RING, b * TH + RING + TH)
            if sf == 4:
                w = w + ktwv[sl_i, :] * _tilesum(pin, sf)

            @pl.when(par == 0)
            def _():
                p1v[sl_i, :] = pin

            @pl.when(par == 1)
            def _():
                p0v[sl_i, :] = pin

            wv[sl_i, :] = w
            pw = pw + jnp.sum(pin * w)
        scal[0, S_PW] = pw
        alpha = scal[0, S_R1] / jnp.where(pw == 0.0, 1.0, pw)
        scal[0, S_ALPHA] = alpha
        if track_e:
            scal[0, S_E] = scal[0, S_E] - alpha * scal[0, S_R1]

        # sweep B: x += alpha p_new; r -= alpha w; rr = <r, r>
        rr = jnp.float32(0.0)
        rz = jnp.float32(0.0)
        for b in range(n_bands):
            sl_i = slice(b * TH + RING, b * TH + RING + TH)
            p_new = jnp.where(par == 0, p1v[sl_i, :], p0v[sl_i, :])
            x = xv[sl_i, :] + alpha * p_new
            r = rv[sl_i, :] - alpha * wv[sl_i, :]
            xv[sl_i, :] = x
            rv[sl_i, :] = r
            rr = rr + jnp.sum(r * r)
            if jacobi:
                rz = rz + jnp.sum(r * r * ivdv[sl_i, :])
        scal[0, S_R0] = scal[0, S_R1]
        scal[0, S_R1] = rz if jacobi else rr
        if jacobi:
            scal[0, S_RR2] = rr
        r1_ref[lane, 0] = rr

    # ------- epilogue: write x back + the tracked energy ---------------
    @pl.when(it == n_it - 1)
    def _():
        e_ref[lane, 0] = scal[0, S_E] if track_e else jnp.float32(0.0)
        cp = pltpu.make_async_copy(xv, X_out.at[lane], sems.at[2])
        cp.start()
        cp.wait()


def _kernel_vmem(consts_ref, X_hbm, F_hbm, R0_hbm, Z0U_hbm,
                 X_out, iters_ref, r1_ref, e_ref,
                 xv, rv, p0v, p1v, wv, fv, scal, sems,
                 *, lam: float, sf: int, n_bands: int, th: int,
                 jacobi: bool, rows: bool = False, track_e: bool = False):
    """Grid (B, max_iter + 3): it=0 load+prologue, it in [1, max_iter+1]
    one full CG iteration per step, it=max_iter+2 epilogue (x out).

    ``rows``: F uses the unpacked 11(+1)-row layout (mask rows resident,
    no per-band bitfield unpack in the sweeps)."""
    TH = th
    TB = TH + 2 * RING
    ivd_i = IVDR if rows else IVD
    lane = pl.program_id(0)
    it = pl.program_id(1)
    n_it = pl.num_programs(1)
    tol_sq = consts_ref[lane, 0]
    max_iter = consts_ref[lane, 2]

    # ---------------- it == 0: load resident state + r0 prologue --------
    @pl.when(it == 0)
    def _():
        scal[0, S_R0] = 0.0
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0

        cp_x = pltpu.make_async_copy(X_hbm.at[lane], xv, sems.at[0])
        cp_f = pltpu.make_async_copy(F_hbm.at[lane], fv, sems.at[1])
        cp_x.start()
        cp_f.start()
        # zero the planes the prologue/iterations assume zeroed (ring
        # rows of p/w stay zero forever; r ring likewise)
        zero = jnp.zeros_like(p0v)
        p0v[...] = zero
        p1v[...] = zero
        wv[...] = zero
        rv[...] = zero
        cp_x.wait()
        cp_f.wait()

        def body(q_buf, qsem, zu_buf=None, zsem=None):
            rr = jnp.float32(0.0)
            rz = jnp.float32(0.0)
            e0 = jnp.float32(0.0)
            for b in range(n_bands):
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).start()
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).start()
                x = xv[b * TH:b * TH + TB, :]
                f = fv.at[:, pl.ds(b * TH, TB), :]
                w, _ = _matvec_band(x, f, lam, sf, TH, rows)
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).wait()
                q = q_buf
                fwd_x, bwd_x, fwd_y, bwd_y = _band_masks(f, rows)
                q1 = fwd_x * q[0]
                q1b = bwd_x * q[0]
                dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
                q2 = fwd_y * q[1]
                q2b = bwd_y * q[1]
                dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
                gq = (dxq + dyq - q[2])[RING:RING + TH, :]
                rhs = q[3, RING:RING + TH, :] + (
                    gq if lam == 1.0 else lam * gq)
                r = rhs - w
                rv[b * TH + RING:b * TH + RING + TH, :] = r
                rr = rr + jnp.sum(r * r)
                if jacobi:
                    rz = rz + jnp.sum(
                        r * r
                        * fv[ivd_i, b * TH + RING:b * TH + RING + TH, :])
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).wait()
                    e0 = e0 + _e0_band(x, f, q_buf, zu_buf, lam, sf, TH,
                                       rows=rows)
            scal[0, S_R1] = rz if jacobi else rr
            if jacobi:
                scal[0, S_RR2] = rr
            if track_e:
                scal[0, S_E] = e0
            r1_ref[lane, 0] = rr

        pl.run_scoped(
            body,
            q_buf=pltpu.VMEM((4, TB, X_hbm.shape[-1]), jnp.float32),
            qsem=pltpu.SemaphoreType.DMA(()),
            **(dict(zu_buf=pltpu.VMEM((2, TB, X_hbm.shape[-1]),
                                      jnp.float32),
                    zsem=pltpu.SemaphoreType.DMA(())) if track_e else {}),
        )

    # ---------------- iteration steps --------------------------------
    is_iter = (it >= 1) & (it < n_it - 1)

    @pl.when(is_iter)
    def _():
        r1 = scal[0, S_R1]
        stop_dot = scal[0, S_RR2] if jacobi else r1
        active = jnp.where(
            (stop_dot > tol_sq)
            & ((it - 1).astype(jnp.float32) <= max_iter),
            scal[0, S_ACT], 0.0)
        scal[0, S_ACT] = active
        scal[0, S_BETA] = jnp.where(
            it == 1, 0.0,
            r1 / jnp.where(scal[0, S_R0] == 0.0, 1.0, scal[0, S_R0]))

        @pl.when(active > 0.0)
        def _():
            iters_ref[lane, 0] += 1.0

    active = (scal[0, S_ACT] > 0.0) & is_iter

    @pl.when(active)
    def _():
        beta = scal[0, S_BETA]
        par = lax.rem(it - 1, 2)

        # sweep A: p = z + beta p (ping-pong), w = M p, pw = <p, w>
        # (track_e's energy update is scalar-only, see _e0_band)
        pw = jnp.float32(0.0)
        for b in range(n_bands):
            sl_b = slice(b * TH, b * TH + TB)
            r = rv[sl_b, :]
            # read p_old from the parity-selected plane without branching
            # on a traced value: both planes are resident, select by par.
            p_old = jnp.where(par == 0, p0v[sl_b, :], p1v[sl_b, :])
            if jacobi:
                z = r * fv[ivd_i, sl_b, :]
            else:
                z = r
            p = z + beta * p_old
            f = fv.at[:, pl.ds(b * TH, TB), :]
            w, pin = _matvec_band(p, f, lam, sf, TH, rows)
            sl_i = slice(b * TH + RING, b * TH + RING + TH)

            @pl.when(par == 0)
            def _():
                p1v[sl_i, :] = pin

            @pl.when(par == 1)
            def _():
                p0v[sl_i, :] = pin

            wv[sl_i, :] = w
            pw = pw + jnp.sum(pin * w)
        scal[0, S_PW] = pw
        alpha = scal[0, S_R1] / jnp.where(pw == 0.0, 1.0, pw)
        scal[0, S_ALPHA] = alpha
        if track_e:
            scal[0, S_E] = scal[0, S_E] - alpha * scal[0, S_R1]

        # sweep B: x += alpha p_new; r -= alpha w; rr = <r, r>
        rr = jnp.float32(0.0)
        rz = jnp.float32(0.0)
        for b in range(n_bands):
            sl_i = slice(b * TH + RING, b * TH + RING + TH)
            p_new = jnp.where(par == 0, p1v[sl_i, :], p0v[sl_i, :])
            x = xv[sl_i, :] + alpha * p_new
            r = rv[sl_i, :] - alpha * wv[sl_i, :]
            xv[sl_i, :] = x
            rv[sl_i, :] = r
            rr = rr + jnp.sum(r * r)
            if jacobi:
                rz = rz + jnp.sum(r * r * fv[ivd_i, sl_i, :])
        scal[0, S_R0] = scal[0, S_R1]
        scal[0, S_R1] = rz if jacobi else rr
        if jacobi:
            scal[0, S_RR2] = rr
        r1_ref[lane, 0] = rr

    # ------- epilogue: write x back + the tracked energy ---------------
    @pl.when(it == n_it - 1)
    def _():
        e_ref[lane, 0] = scal[0, S_E] if track_e else jnp.float32(0.0)
        cp = pltpu.make_async_copy(xv, X_out.at[lane], sems.at[0])
        cp.start()
        cp.wait()


def _kernel_vmem_hybrid(consts_ref, X_hbm, F_hbm, R0_hbm, Z0U_hbm,
                        X_out, iters_ref, r1_ref, e_ref,
                        *refs, lam: float, sf: int, n_bands: int, th: int,
                        jacobi: bool, track_e: bool = False):
    """Hybrid residency: CG state (x/r/p ping-pong/w, + invd for Jacobi)
    stays in VMEM across the whole solve; the 8 packed coefficient rows are
    re-streamed HBM->VMEM band-by-band (double-buffered) in the matvec
    sweep of every iteration.  Same grid/step structure and arithmetic as
    :func:`_kernel_vmem` (including the load-bearing fused p-update)."""
    if jacobi:
        xv, rv, p0v, p1v, wv, fb, ivdv, scal, sems = refs
    else:
        xv, rv, p0v, p1v, wv, fb, scal, sems = refs
        ivdv = None
    TH = th
    TB = TH + 2 * RING
    lane = pl.program_id(0)
    it = pl.program_id(1)
    n_it = pl.num_programs(1)
    tol_sq = consts_ref[lane, 0]
    max_iter = consts_ref[lane, 2]

    def _f_copy(b, cur):
        return pltpu.make_async_copy(
            F_hbm.at[lane, pl.ds(0, 8), pl.ds(b * TH, TB), :],
            fb.at[cur], sems.at[cur])

    # ---------------- it == 0: load state + r0 prologue -----------------
    @pl.when(it == 0)
    def _():
        scal[0, S_R0] = 0.0
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0

        cp_x = pltpu.make_async_copy(X_hbm.at[lane], xv, sems.at[2])
        cp_x.start()
        if jacobi:
            cp_i = pltpu.make_async_copy(F_hbm.at[lane, IVD], ivdv,
                                         sems.at[3])
            cp_i.start()
        zero = jnp.zeros_like(p0v)
        p0v[...] = zero
        p1v[...] = zero
        wv[...] = zero
        rv[...] = zero
        cp_x.wait()
        if jacobi:
            cp_i.wait()

        def body(q_buf, qsem, zu_buf=None, zsem=None):
            rr = jnp.float32(0.0)
            rz = jnp.float32(0.0)
            e0 = jnp.float32(0.0)
            _f_copy(0, 0).start()
            for b in range(n_bands):
                cur = b % 2
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).start()
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).start()
                if b + 1 < n_bands:
                    _f_copy(b + 1, 1 - cur).start()
                _f_copy(b, cur).wait()
                x = xv[b * TH:b * TH + TB, :]
                f = fb.at[cur]
                w, _ = _matvec_band(x, f, lam, sf, TH)
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).wait()
                q = q_buf
                fwd_x, bwd_x, fwd_y, bwd_y = _unpack_masks(f[MB])
                q1 = fwd_x * q[0]
                q1b = bwd_x * q[0]
                dxq = _shift(q1, 0, -1) - q1 + q1b - _shift(q1b, 0, 1)
                q2 = fwd_y * q[1]
                q2b = bwd_y * q[1]
                dyq = _shift(q2, -1, 0) - q2 + q2b - _shift(q2b, 1, 0)
                gq = (dxq + dyq - q[2])[RING:RING + TH, :]
                rhs = q[3, RING:RING + TH, :] + (
                    gq if lam == 1.0 else lam * gq)
                r = rhs - w
                rv[b * TH + RING:b * TH + RING + TH, :] = r
                rr = rr + jnp.sum(r * r)
                if jacobi:
                    rz = rz + jnp.sum(
                        r * r * ivdv[b * TH + RING:b * TH + RING + TH, :])
                if track_e:
                    pltpu.make_async_copy(
                        Z0U_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                        zu_buf, zsem).wait()
                    e0 = e0 + _e0_band(x, f, q_buf, zu_buf, lam, sf, TH)
            scal[0, S_R1] = rz if jacobi else rr
            if jacobi:
                scal[0, S_RR2] = rr
            if track_e:
                scal[0, S_E] = e0
            r1_ref[lane, 0] = rr

        pl.run_scoped(
            body,
            q_buf=pltpu.VMEM((4, TB, X_hbm.shape[-1]), jnp.float32),
            qsem=pltpu.SemaphoreType.DMA(()),
            **(dict(zu_buf=pltpu.VMEM((2, TB, X_hbm.shape[-1]),
                                      jnp.float32),
                    zsem=pltpu.SemaphoreType.DMA(())) if track_e else {}),
        )

    # ---------------- iteration steps --------------------------------
    is_iter = (it >= 1) & (it < n_it - 1)

    @pl.when(is_iter)
    def _():
        r1 = scal[0, S_R1]
        stop_dot = scal[0, S_RR2] if jacobi else r1
        active = jnp.where(
            (stop_dot > tol_sq)
            & ((it - 1).astype(jnp.float32) <= max_iter),
            scal[0, S_ACT], 0.0)
        scal[0, S_ACT] = active
        scal[0, S_BETA] = jnp.where(
            it == 1, 0.0,
            r1 / jnp.where(scal[0, S_R0] == 0.0, 1.0, scal[0, S_R0]))

        @pl.when(active > 0.0)
        def _():
            iters_ref[lane, 0] += 1.0

    active = (scal[0, S_ACT] > 0.0) & is_iter

    @pl.when(active)
    def _():
        beta = scal[0, S_BETA]
        par = lax.rem(it - 1, 2)

        # sweep A: p = z + beta p (ping-pong), w = M p, pw = <p, w>;
        # F bands stream in double-buffered under the compute.
        # (track_e's energy update is scalar-only, see _e0_band)
        pw = jnp.float32(0.0)
        _f_copy(0, 0).start()
        for b in range(n_bands):
            cur = b % 2
            if b + 1 < n_bands:
                _f_copy(b + 1, 1 - cur).start()
            _f_copy(b, cur).wait()
            sl_b = slice(b * TH, b * TH + TB)
            r = rv[sl_b, :]
            p_old = jnp.where(par == 0, p0v[sl_b, :], p1v[sl_b, :])
            if jacobi:
                z = r * ivdv[sl_b, :]
            else:
                z = r
            p = z + beta * p_old
            w, pin = _matvec_band(p, fb.at[cur], lam, sf, TH)
            sl_i = slice(b * TH + RING, b * TH + RING + TH)

            @pl.when(par == 0)
            def _():
                p1v[sl_i, :] = pin

            @pl.when(par == 1)
            def _():
                p0v[sl_i, :] = pin

            wv[sl_i, :] = w
            pw = pw + jnp.sum(pin * w)
        scal[0, S_PW] = pw
        alpha = scal[0, S_R1] / jnp.where(pw == 0.0, 1.0, pw)
        scal[0, S_ALPHA] = alpha
        if track_e:
            scal[0, S_E] = scal[0, S_E] - alpha * scal[0, S_R1]

        # sweep B: x += alpha p_new; r -= alpha w; rr = <r, r> (no F)
        rr = jnp.float32(0.0)
        rz = jnp.float32(0.0)
        for b in range(n_bands):
            sl_i = slice(b * TH + RING, b * TH + RING + TH)
            p_new = jnp.where(par == 0, p1v[sl_i, :], p0v[sl_i, :])
            x = xv[sl_i, :] + alpha * p_new
            r = rv[sl_i, :] - alpha * wv[sl_i, :]
            xv[sl_i, :] = x
            rv[sl_i, :] = r
            rr = rr + jnp.sum(r * r)
            if jacobi:
                rz = rz + jnp.sum(r * r * ivdv[sl_i, :])
        scal[0, S_R0] = scal[0, S_R1]
        scal[0, S_R1] = rz if jacobi else rr
        if jacobi:
            scal[0, S_RR2] = rr
        r1_ref[lane, 0] = rr

    # ------- epilogue: write x back + the tracked energy ---------------
    @pl.when(it == n_it - 1)
    def _():
        e_ref[lane, 0] = scal[0, S_E] if track_e else jnp.float32(0.0)
        cp = pltpu.make_async_copy(xv, X_out.at[lane], sems.at[2])
        cp.start()
        cp.wait()


def cg_pallas_vmem_fromop_batched(
    x0, op, gm, ktw, z0t, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100, invd=None,
    with_energy: bool = False, z0u=None,
):
    """Lane-batched fully VMEM-resident CG with in-kernel r0 prologue.

    Same contract as pallas_cg_pipe.cg_pallas_pipelined_fromop_batched;
    callers must gate on :func:`supported_vmem`. With
    ``with_energy=True`` a 4th array is returned: the depth energy at
    the final iterate, exactly tracked in-kernel (well-conditioned
    warm-start evaluation in the prologue + the per-iteration CG
    identity, see :func:`_e0_band`); the caller adds ``lam * sum B^2``
    (= op.const). Requires ``z0u``: the (B, 2, hp2, wp)
    :func:`energy_planes` stack (``srps.SRPSProblem.z0up``)."""
    B, h, w = x0.shape
    jacobi = invd is not None
    if sf not in (1, 2, 4):
        raise ValueError(f"unsupported sf: {sf}")
    th = vmem_th(h, w)
    geo = geometry(h, w, th)
    mode = vmem_mode(h, w, sf, jacobi, _check_backend=False)
    if mode is None:
        raise ValueError(
            f"grid {h}x{w} exceeds the resident-kernel VMEM budget "
            "(gate on supported_vmem)")
    rows = mode in ("full", "full_stencil", "hybrid_stencil")
    stack_fn = stack_fields_rows if rows else stack_fields_packed
    if jacobi:
        F = jax.vmap(lambda o, g, k, i: stack_fn(
            o, g, k, geo, invd=i))(op, gm, ktw, jnp.asarray(
                invd, jnp.float32))
    else:
        F = jax.vmap(lambda o, g, k: stack_fn(o, g, k, geo))(
            op, gm, ktw)
    R0 = jax.vmap(lambda o, z: jnp.stack(
        [pad_field(r, geo) for r in (o.QB1, o.QB2, o.QB3, z)]))(
            op, jnp.asarray(z0t, jnp.float32))
    X = jax.vmap(lambda a: pad_field(a, geo))(jnp.asarray(x0, jnp.float32))
    hp2_, wp_ = geo.shape
    if not with_energy:
        # track_e=False specializes the kernel: no energy DMAs, dots, or
        # scalar updates are traced. The operand is a minimal dummy kept
        # only for the uniform pallas_call signature; it is never read.
        Z0U = jnp.zeros((B, 2, 8, 128), jnp.float32)
    else:
        if z0u is None:
            raise ValueError("with_energy=True requires z0u "
                             "(srps.SRPSProblem.z0up / energy_planes)")
        Z0U = jnp.asarray(z0u, jnp.float32)
        if Z0U.shape != (B, 2, hp2_, wp_):
            raise ValueError(
                f"z0u shape {Z0U.shape} != {(B, 2, hp2_, wp_)} — build it "
                "with pallas_cg_vmem.energy_planes for this geometry")
    consts = jnp.stack([
        jnp.full((B,), jnp.float32(tol) ** 2),
        jnp.zeros((B,), jnp.float32),
        jnp.full((B,), jnp.float32(max_iter)),
    ], axis=1)  # (B, 3)

    hp2, wp = geo.shape
    nf = _n_fields(jacobi, rows=rows)
    tb = geo.th + 2 * RING
    state = [
        pltpu.VMEM((hp2, wp), jnp.float32),       # x
        pltpu.VMEM((hp2, wp), jnp.float32),       # r
        pltpu.VMEM((hp2, wp), jnp.float32),       # p ping
        pltpu.VMEM((hp2, wp), jnp.float32),       # p pong
        pltpu.VMEM((hp2, wp), jnp.float32),       # w
    ]
    extra_out_specs = []
    extra_out_shapes = []
    # Jacobi rides the full_stencil mode as plain CG on the symmetrically
    # scaled system (see _kernel_vmem_stencil's `scaled` doc): the
    # preconditioner folds into the resident C planes at prologue time,
    # so the iteration sweeps are EXACTLY the plain kernel's — the
    # direct in-sweep jacobi form measured ~2.4x/iteration (r5 grid).
    scaled = jacobi and mode == "full_stencil" and sf in (1, 2)
    kernel_jacobi = jacobi and not scaled
    if mode == "full_stencil":
        kern_fn = functools.partial(_kernel_vmem_stencil, scaled=scaled)
        scratch = state + [
            pltpu.VMEM((N_STENCIL, hp2, wp), jnp.float32),  # C resident
        ] + ([pltpu.VMEM((hp2, wp), jnp.float32)] if sf == 4 else []) + (
            [pltpu.VMEM((hp2, wp), jnp.float32)] if kernel_jacobi
            else []) + [
            pltpu.SMEM((1, 9), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    elif mode == "hybrid_stencil":
        kern_fn = _kernel_vmem_hybrid_stencil
        scratch = state + [
            pltpu.VMEM((2, N_STENCIL, geo.th, wp), jnp.float32),  # C window
        ] + ([pltpu.VMEM((hp2, wp), jnp.float32)] if sf == 4 else []) + (
            [pltpu.VMEM((hp2, wp), jnp.float32)] if jacobi else []) + [
            pltpu.SMEM((1, 9), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
        # HBM scratch the prologue fills with the stencil planes (interior
        # rows only) and the iterations re-stream.
        extra_out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
        extra_out_shapes = [jax.ShapeDtypeStruct(
            (B, N_STENCIL, geo.hp, wp), jnp.float32)]
    elif mode in ("full", "full_packed"):
        kern_fn = functools.partial(_kernel_vmem, rows=rows)
        scratch = state + [
            pltpu.VMEM((nf, hp2, wp), jnp.float32),   # F resident
            pltpu.SMEM((1, 9), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:  # hybrid: F double-buffered band window (+ resident invd)
        kern_fn = _kernel_vmem_hybrid
        scratch = state + [
            pltpu.VMEM((2, 8, tb, wp), jnp.float32),  # F band window
        ] + ([pltpu.VMEM((hp2, wp), jnp.float32)] if jacobi else []) + [
            pltpu.SMEM((1, 9), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    kernel = functools.partial(
        kern_fn, lam=lam, sf=sf, n_bands=geo.n_bands, th=geo.th,
        jacobi=kernel_jacobi, track_e=with_energy)
    X_new, iters, r1, e_part, *_cscr = pl.pallas_call(
        kernel,
        grid=(B, max_iter + 3),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + extra_out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(X.shape, X.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ] + extra_out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_BUDGET),
        interpret=_pcg.INTERPRET,
    )(consts, X, F, R0, Z0U)
    x = jax.vmap(lambda a: unpad_field(a, geo))(X_new)
    if with_energy:
        return (x, iters[:, 0].astype(jnp.int32), r1[:, 0], e_part[:, 0])
    return x, iters[:, 0].astype(jnp.int32), r1[:, 0]


def cg_pallas_vmem_fromop(
    x0, op, gm, ktw, z0t, *, sf: int, lam: float,
    tol: float = 1e-9, max_iter: int = 100, invd=None,
    with_energy: bool = False, z0u=None,
):
    """Single-problem wrapper over the VMEM-resident variant."""
    add_b = lambda a: jnp.asarray(a)[None]
    out = cg_pallas_vmem_fromop_batched(
        add_b(x0),
        jax.tree_util.tree_map(add_b, op),
        jax.tree_util.tree_map(add_b, gm),
        add_b(ktw), add_b(z0t), sf=sf, lam=lam, tol=tol, max_iter=max_iter,
        invd=None if invd is None else add_b(invd),
        with_energy=with_energy,
        z0u=None if z0u is None else add_b(z0u))
    return tuple(a[0] for a in out)
