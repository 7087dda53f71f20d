"""Manual shard_map grid-sharded CG with explicit halo exchange.

The GSPMD path (parallel/sharded.py) lets the XLA partitioner insert halo
exchanges for the +/-1 stencils automatically. This module is the
hand-scheduled alternative (BASELINE.json config 5: "1080p depth SR with
grid-sharded PCG (halo-exchange matvec over mesh)"), tuned to the minimum
possible communication:

  - the HR grid is partitioned over a 1D mesh axis in row bands (band
    heights multiples of sf, so the box-resample term never crosses a
    shard boundary; x-direction stencils are band-local by construction),
  - the static coefficient fields' one-row halos are exchanged ONCE per
    solve (a single stacked ppermute pair),
  - per CG iteration the only communication is ONE exchange of v's
    two-row halos (2 ppermutes) — the matvec is then evaluated on the
    one-row-extended domain so the transpose stencil needs no second
    exchange — plus 2 psums for the dot products.

Numerics mirror models.srps.depth_matvec / solve.cg exactly.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


from ..ops import grid as gridops
from ..solve import pallas_cg as _pcg



def _halo_rows(v, k: int, axis_name: str):
    """Exchange k-row halos along the sharded row axis.

    Returns (top, bottom): k rows from the band above / below (zeros at
    the global boundary). 2 ppermutes.
    """
    n = lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i, i - 1) for i in range(1, n)]
    top = lax.ppermute(v[-k:, :], axis_name, down)
    bottom = lax.ppermute(v[:k, :], axis_name, up)
    return top, bottom


def _grad_x_rows(v, fwd_x, bwd_x):
    """Dx on arbitrary row extent (within-row stencil)."""
    left = jnp.concatenate([v[:, 1:], jnp.zeros_like(v[:, :1])], 1)
    right = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], 1)
    return fwd_x * (left - v) + bwd_x * (v - right)


def _grad_x_t_rows(y, fwd_x, bwd_x):
    fy = fwd_x * y
    by = bwd_x * y
    fy_r = jnp.concatenate([jnp.zeros_like(fy[:, :1]), fy[:, :-1]], 1)
    by_l = jnp.concatenate([by[:, 1:], jnp.zeros_like(by[:, :1])], 1)
    return fy_r - fy + by - by_l


_FIELD_NAMES = ("P11", "P12", "P13", "P22", "P23", "P33",
                "fwd_x", "bwd_x", "fwd_y", "bwd_y")


def _extend_fields(P11, P12, P13, P22, P23, P33, fwd_x, bwd_x, fwd_y, bwd_y,
                   axis_name: str):
    """One-time static-field halo extension: stack the 10 coefficient
    fields so a SINGLE ppermute pair fetches every field's 1-row halo,
    then return a name->(h_b+2, w) dict for :func:`matvec_band`."""
    F = jnp.stack([P11, P12, P13, P22, P23, P33,
                   fwd_x, bwd_x, fwd_y, bwd_y])
    Fm = jnp.moveaxis(F, 0, 1)  # (h_b, 10, w): rows leading for halos
    topF, botF = _halo_rows(Fm.reshape(Fm.shape[0], -1), 1, axis_name)
    Fm_ext = jnp.concatenate(
        [topF.reshape(1, *Fm.shape[1:]), Fm,
         botF.reshape(1, *Fm.shape[1:])], 0)
    F_ext = jnp.moveaxis(Fm_ext, 1, 0)  # (10, h_b+2, w)
    return {k: F_ext[i] for i, k in enumerate(_FIELD_NAMES)}


def matvec_band(v, Fx, axis_name: str, sf: int, lam: float,
                masks_local, mask_local):
    """M v on one row band. Fx: dict of 1-row-extended fields (rows -1..h).

    v is the local band (h_b, w); communication: one 2-row halo exchange.
    """
    top2, bot2 = _halo_rows(v, 2, axis_name)
    v_ext = jnp.concatenate([top2, v, bot2], 0)  # rows -2 .. h+1
    pe = v_ext[1:-1]  # rows -1 .. h

    g_e = _grad_x_rows(pe, Fx["fwd_x"], Fx["bwd_x"])
    h_e = Fx["fwd_y"] * (v_ext[2:] - pe) + Fx["bwd_y"] * (pe - v_ext[:-2])

    t1_e = Fx["P11"] * g_e + Fx["P12"] * h_e - Fx["P13"] * pe
    t2_e = Fx["P12"] * g_e + Fx["P22"] * h_e - Fx["P23"] * pe
    t3_c = (Fx["P13"] * g_e + Fx["P23"] * h_e - Fx["P33"] * pe)[1:-1]

    dxt = _grad_x_t_rows(t1_e[1:-1], Fx["fwd_x"][1:-1], Fx["bwd_x"][1:-1])
    fy_e = Fx["fwd_y"] * t2_e
    by_e = Fx["bwd_y"] * t2_e
    hb = v.shape[0]
    # (Dy^T t2)(i) = fy(i-1) - fy(i) + by(i) - by(i+1), i = 0..hb-1;
    # fy_e index i+1 corresponds to row i.
    dyt = fy_e[0:hb] - fy_e[1:hb + 1] + by_e[1:hb + 1] - by_e[2:hb + 2]

    ata = dxt + dyt - t3_c
    kt = gridops.resample_masked(v, masks_local, sf)
    ktt = gridops.resample_masked_t(kt, mask_local, masks_local, sf)
    return ktt + lam * ata


# ---------------------------------------------------------------------------
# Per-shard Pallas CG: the fused band kernels of solve/pallas_cg.py run
# inside each shard, with ppermute halo refreshes and psum'd dot products
# between kernel calls (VERDICT round 1 item 2).
# ---------------------------------------------------------------------------


def _shard_th(h_b: int, w: int):
    """Band height for the per-shard kernels: must divide the shard height
    exactly so the 2-row halos live inside the kernels' 8-row alignment
    ring (the kernels then compute real interior rows only, keeping the
    in-kernel <p, w> reduction shard-exact)."""
    for th in (64, 32, 16, 8):
        if h_b % th == 0 and _pcg.pick_th(h_b, w, pipelined=False) is not None:
            if _pcg._vmem_rows_per_width(th, False) * (-(-w // 128) * 128) * 4 \
                    <= 12 << 20:
                return th
    return None


def shard_cg_pallas_supported(h: int, w: int, sf: int, n_shards: int) -> bool:
    h_b = h // n_shards
    return (h % n_shards == 0 and h_b % 8 == 0 and h_b % sf == 0
            and sf in (1, 2, 4) and _shard_th(h_b, w) is not None
            and (_pcg.INTERPRET
                 or jax.default_backend() in ("tpu", "axon")))


def _exchange_into_ring(a, h_b: int, axis_name: str, rows: int = 2):
    """Refresh a padded field's ring halo rows from the neighbouring
    shards' interior edges (2 ppermutes for both directions)."""
    R = _pcg.RING
    top, bottom = _halo_rows(a[R:R + h_b], rows, axis_name)
    a = lax.dynamic_update_slice(a, top, (R - rows, 0))
    a = lax.dynamic_update_slice(a, bottom, (R + h_b, 0))
    return a


def cg_sharded_pallas(
    mesh: Mesh,
    axis_name: str,
    x0, b_residual, op, gm, mask, masks,
    *, sf: int, lam: float, tol: float = 1e-9, max_iter: int = 100,
):
    """cg_sharded with the fused Pallas band kernels inside each shard.

    Same contract as :func:`cg_sharded`; requires
    :func:`shard_cg_pallas_supported`. Per CG iteration the communication
    is exactly 2 halo refreshes (p after the matvec kernel, r after the
    axpy kernel — 2 ppermutes each) and 2 scalar psums; everything else is
    the single-shard kernels of solve/pallas_cg.py run on the local band.
    """
    h, w = x0.shape
    n_shards = mesh.shape[axis_name]
    h_b = h // n_shards
    th = _shard_th(h_b, w)
    if th is None:
        raise ValueError(f"unsupported shard geometry: h_b={h_b}, w={w}")
    geo = _pcg.geometry(h_b, w, th)
    tol_sq = jnp.float32(tol) ** 2
    IX, IR, IW = _pcg.IX, _pcg.IR, _pcg.IW

    def body_fn(x0_l, b_l, P11, P12, P13, P22, P23, P33,
                fwd_x, bwd_x, fwd_y, bwd_y, mask_l, masks_l):
        ktw_l = _pcg.make_ktw(mask_l, masks_l, sf)

        from types import SimpleNamespace

        op_l = SimpleNamespace(P11=P11, P12=P12, P13=P13, P22=P22,
                               P23=P23, P33=P33)
        gm_l = SimpleNamespace(fwd_x=fwd_x, bwd_x=bwd_x,
                               fwd_y=fwd_y, bwd_y=bwd_y)

        # Static fields: pad + one-time 1-row halo refresh (stacked, so one
        # ppermute pair covers all 11 fields).
        F = _pcg.stack_fields(op_l, gm_l, ktw_l, geo)
        Fm = jnp.moveaxis(F, 0, 1).reshape(F.shape[1], -1)
        Fm = _exchange_into_ring(Fm, h_b, axis_name, rows=1)
        F = jnp.moveaxis(Fm.reshape(F.shape[1], F.shape[0], F.shape[2]),
                         1, 0)

        S = jnp.stack([
            _pcg.pad_field(jnp.asarray(x0_l, jnp.float32), geo),
            _pcg.pad_field(jnp.asarray(b_l, jnp.float32), geo),
            jnp.zeros(geo.shape, jnp.float32),
        ])
        # r's halo rows (b_residual edges) for the first kernel-A call.
        S = S.at[IR].set(_exchange_into_ring(S[IR], h_b, axis_name))
        p = jnp.zeros(geo.shape, jnp.float32)
        p_alt = jnp.zeros(geo.shape, jnp.float32)
        pdot = lambda v: lax.psum(v, axis_name)
        # (ring halo rows of r are neighbour-interior copies; exclude them)
        r1_0 = pdot(jnp.sum(S[IR, _pcg.RING:_pcg.RING + h_b] ** 2))

        def cond(c):
            S, p, p_alt, r0, r1, k = c
            return (r1 > tol_sq) & (k <= max_iter)

        def body(c):
            S, p, p_alt, r0, r1, k = c
            k = k + 1
            beta = jnp.where(k == 1, 0.0, r1 / jnp.where(r0 == 0, 1.0, r0))
            p_new, S, pw = _pcg._call_kernel_a(
                S, p, p_alt, F, beta.reshape(1, 1), geo, lam, sf)
            pw = pdot(pw[0, 0])
            alpha = r1 / jnp.where(pw == 0, 1.0, pw)
            # Refresh p_new's ring halo before it becomes next iteration's
            # stencil input (kernel A writes interiors only).
            p_new = _exchange_into_ring(p_new, h_b, axis_name)
            S, rr = _pcg._call_kernel_b(S, p_new, alpha.reshape(1, 1), geo)
            rr = pdot(rr[0, 0])
            S = S.at[IR].set(_exchange_into_ring(S[IR], h_b, axis_name))
            return S, p_new, p, r1, rr, k

        S, p, p_alt, _, r1, k = lax.while_loop(
            cond, body,
            (S, p, p_alt, jnp.float32(0.0), r1_0, jnp.int32(0)))
        return _pcg.unpad_field(S[IX], geo), k, r1

    spec = P(axis_name, None)
    fn = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(spec,) * 14,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return fn(x0, b_residual, op.P11, op.P12, op.P13, op.P22, op.P23,
              op.P33, gm.fwd_x, gm.bwd_x, gm.fwd_y, gm.bwd_y, mask, masks)


def cg_sharded_cgs(
    mesh: Mesh,
    axis_name: str,
    x0, b_residual, op, gm, mask, masks,
    *, sf: int, lam: float, tol: float = 1e-9, max_iter: int = 100,
):
    """Chronopoulos-Gear single-reduction CG over row-band shards.

    Same contract as :func:`cg_sharded`, but the two data-dependent psums
    of standard CG (<p,Mp> must complete before the axpy that produces
    <r,r>) collapse into ONE fused psum of the (gamma, delta) pair per
    iteration — the latency win the CGS recurrence exists for at
    multi-chip scale. Per iteration: 1 two-row halo exchange of r
    (2 ppermutes) + 1 psum of a length-2 vector. Opt-in
    (``pallas_cg_variant='cgs'``): the alpha recurrence reorders rounding
    vs standard CG.
    """
    tol_sq = jnp.float32(tol) ** 2

    def body_fn(x0_l, b_l, P11, P12, P13, P22, P23, P33,
                fwd_x, bwd_x, fwd_y, bwd_y, mask_l, masks_l):
        Fx = _extend_fields(P11, P12, P13, P22, P23, P33,
                            fwd_x, bwd_x, fwd_y, bwd_y, axis_name)

        mv = functools.partial(
            matvec_band, Fx=Fx, axis_name=axis_name, sf=sf, lam=lam,
            masks_local=masks_l, mask_local=mask_l)

        def gd(r, w):
            # ONE fused collective for both CG scalars.
            return lax.psum(
                jnp.stack([jnp.vdot(r, r), jnp.vdot(w, r)]), axis_name)

        r = b_l
        w = mv(r)
        gamma_delta = gd(r, w)

        def cond(c):
            x, r, w, p, s, g_old, a_old, gdv, k = c
            return (gdv[0] > tol_sq) & (k <= max_iter)

        def body(c):
            x, r, w, p, s, g_old, a_old, gdv, k = c
            gamma, delta = gdv[0], gdv[1]
            k = k + 1
            beta = jnp.where(k == 1, 0.0,
                             gamma / jnp.where(g_old == 0.0, 1.0, g_old))
            denom = delta - beta * gamma / a_old
            alpha = gamma / jnp.where(denom == 0.0, 1.0, denom)
            p = r + beta * p
            s = w + beta * s
            x = x + alpha * p
            r = r - alpha * s
            w = mv(r)
            return x, r, w, p, s, gamma, alpha, gd(r, w), k

        x, r, w, p, s, _, _, gdv, k = lax.while_loop(
            cond, body,
            (x0_l, r, w, jnp.zeros_like(r), jnp.zeros_like(r),
             jnp.float32(1.0), jnp.float32(1.0), gamma_delta, jnp.int32(0)))
        return x, k, gdv[0]

    spec = P(axis_name, None)
    fn = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(spec,) * 14,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return fn(x0, b_residual, op.P11, op.P12, op.P13, op.P22, op.P23,
              op.P33, gm.fwd_x, gm.bwd_x, gm.fwd_y, gm.bwd_y, mask, masks)


def cg_sharded(
    mesh: Mesh,
    axis_name: str,
    x0, b_residual, op, gm, mask, masks,
    *, sf: int, lam: float, tol: float = 1e-9, max_iter: int = 100,
):
    """Warm-started reference-semantics CG over row-band shards.

    All (h, w) args sharded P(axis_name, None); (h / n_shards) % sf == 0.
    Returns (x, iterations, final squared residual).
    """
    tol_sq = jnp.float32(tol) ** 2

    def body_fn(x0_l, b_l, P11, P12, P13, P22, P23, P33,
                fwd_x, bwd_x, fwd_y, bwd_y, mask_l, masks_l):
        Fx = _extend_fields(P11, P12, P13, P22, P23, P33,
                            fwd_x, bwd_x, fwd_y, bwd_y, axis_name)

        pdot = lambda a, b: lax.psum(jnp.vdot(a, b), axis_name)
        mv = functools.partial(
            matvec_band, Fx=Fx, axis_name=axis_name, sf=sf, lam=lam,
            masks_local=masks_l, mask_local=mask_l)

        def cond(c):
            x, r, p, r0, r1, k = c
            return (r1 > tol_sq) & (k <= max_iter)

        def body(c):
            x, r, p, r0, r1, k = c
            k = k + 1
            beta = jnp.where(k == 1, 0.0, r1 / jnp.where(r0 == 0, 1.0, r0))
            p = r + beta * p
            w = mv(p)
            pw = pdot(p, w)
            alpha = r1 / jnp.where(pw == 0, 1.0, pw)
            x = x + alpha * p
            r = r - alpha * w
            return x, r, p, r1, pdot(r, r), k

        r1 = pdot(b_l, b_l)
        x, r, p, r0, r1, k = lax.while_loop(
            cond, body,
            (x0_l, b_l, jnp.zeros_like(b_l), jnp.float32(0.0), r1,
             jnp.int32(0)))
        return x, k, r1

    spec = P(axis_name, None)
    fn = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(spec,) * 14,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return fn(x0, b_residual, op.P11, op.P12, op.P13, op.P22, op.P23,
              op.P33, gm.fwd_x, gm.bwd_x, gm.fwd_y, gm.bwd_y, mask, masks)
