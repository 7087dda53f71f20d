"""Interleaved A/B/C pricing of the round-3 sweep micro-optimisations in
the VMEM-resident CG kernel (run ALONE on the chip):

  A  v1 kernel, MASK_COLS=True  — the exact historical formulation
     (p ping-pong + column-masked shifts + unconditional lam multiply)
  B  v1 kernel, MASK_COLS=False — prices the column-mask drop alone
  C  the production kernel (pallas_cg_vmem)

The v1 kernel + wrapper below are a frozen copy of the pre-change
pallas_cg_vmem (git 3a6ad89) so all three variants trace in ONE process;
the chip's effective rate drifts tens of percent across processes
(CLAUDE.md), so only interleaved same-process marginals are comparable.
Costs are difference-of-bests between cap-100 and cap-25 chains.

VERDICTS (one v5e, Mitten 960x1280, two independent runs, all variants
bit-identical in x/r1/iterations):
  * column-mask drop (A vs B): 29.1->27.4 us/iter in run 1 but
    27.6->28.1 in run 2 — within drift noise; kept anyway (strictly
    fewer instructions, bit-identical).
  * single-plane p via a SEPARATE p-update pass (whole-plane or banded):
    51-53 us/iter vs 27.5 fused — 2x REGRESSION, reverted. The separate
    scratch pass serializes against the matvec sweep; the fused p-update
    in sweep A is load-bearing (see pallas_cg_vmem module docstring).
"""

from __future__ import annotations

import functools
import sys
import time

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import find_dataset, synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402
from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg  # noqa: E402
from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm  # noqa: E402
from srmeetsps_cuda_tpu.solve.pallas_cg import (  # noqa: E402
    RING, geometry, pad_field, unpad_field,
)
from srmeetsps_cuda_tpu.solve.pallas_cg_fused import (  # noqa: E402
    S_R0, S_R1, S_PW, S_RR, S_ACT, S_BETA, S_ALPHA,
)
from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import IVD, S_RR2  # noqa: E402
from srmeetsps_cuda_tpu.solve.pallas_cg_vmem import (  # noqa: E402
    IVDR, _band_masks, _n_fields, stack_fields_rows, vmem_th, _shift,
    _matvec_band,
)


# ---------------------------------------------------------------------------
# Frozen v1 kernel (pre-change pallas_cg_vmem._kernel_vmem @ 3a6ad89):
# p ping-pong planes, parity selects, fused p-update in sweep A. The
# matvec comes from the live _matvec_band (whose lam==1 skip is traced
# out by passing lam exactly as the production build does), so variant B
# isolates only the mask/ping-pong deltas.
# ---------------------------------------------------------------------------
def _kernel_vmem_v1(consts_ref, X_hbm, F_hbm, R0_hbm,
                    X_out, iters_ref, r1_ref,
                    xv, rv, p0v, p1v, wv, fv, scal, sems,
                    *, lam: float, sf: int, n_bands: int, th: int,
                    jacobi: bool, rows: bool = False):
    TH = th
    TB = TH + 2 * RING
    ivd_i = IVDR if rows else IVD
    lane = pl.program_id(0)
    it = pl.program_id(1)
    n_it = pl.num_programs(1)
    tol_sq = consts_ref[lane, 0]
    max_iter = consts_ref[lane, 2]

    @pl.when(it == 0)
    def _():
        scal[0, S_R0] = 0.0
        scal[0, S_ACT] = 1.0
        iters_ref[lane, 0] = 0.0
        cp_x = pltpu.make_async_copy(X_hbm.at[lane], xv, sems.at[0])
        cp_f = pltpu.make_async_copy(F_hbm.at[lane], fv, sems.at[1])
        cp_x.start()
        cp_f.start()
        zero = jnp.zeros_like(p0v)
        p0v[...] = zero
        p1v[...] = zero
        wv[...] = zero
        rv[...] = zero
        cp_x.wait()
        cp_f.wait()

        def body(q_buf, qsem):
            rr = jnp.float32(0.0)
            rz = jnp.float32(0.0)
            for b in range(n_bands):
                pltpu.make_async_copy(
                    R0_hbm.at[lane, :, pl.ds(b * TH, TB), :],
                    q_buf, qsem).start()
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
                rhs = (q[3, RING:RING + TH, :]
                       + lam * (dxq + dyq - q[2])[RING:RING + TH, :])
                r = rhs - w
                rv[b * TH + RING:b * TH + RING + TH, :] = r
                rr = rr + jnp.sum(r * r)
                if jacobi:
                    rz = rz + jnp.sum(
                        r * r
                        * fv[ivd_i, b * TH + RING:b * TH + RING + TH, :])
            scal[0, S_R1] = rz if jacobi else rr
            if jacobi:
                scal[0, S_RR2] = rr
            r1_ref[lane, 0] = rr

        pl.run_scoped(
            body,
            q_buf=pltpu.VMEM((4, TB, X_hbm.shape[-1]), jnp.float32),
            qsem=pltpu.SemaphoreType.DMA(()),
        )

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
        pw = jnp.float32(0.0)
        for b in range(n_bands):
            sl_b = slice(b * TH, b * TH + TB)
            r = rv[sl_b, :]
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
        scal[0, S_ALPHA] = scal[0, S_R1] / jnp.where(pw == 0.0, 1.0, pw)

        alpha = scal[0, S_ALPHA]
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

    @pl.when(it == n_it - 1)
    def _():
        cp = pltpu.make_async_copy(xv, X_out.at[lane], sems.at[0])
        cp.start()
        cp.wait()


def cg_v1(x0, op, gm, ktw, z0t, *, sf, lam, tol=1e-9, max_iter=100,
          mask_cols=False):
    """Frozen v1 wrapper ("full" rows mode only, single lane)."""
    add_b = lambda a: jnp.asarray(a)[None]
    x0 = add_b(x0)
    op = jax.tree_util.tree_map(add_b, op)
    gm = jax.tree_util.tree_map(add_b, gm)
    ktw, z0t = add_b(ktw), add_b(z0t)
    B, h, w = x0.shape
    th = vmem_th(h, w)
    geo = geometry(h, w, th)
    _pcg.MASK_COLS = mask_cols
    try:
        F = jax.vmap(lambda o, g, k: stack_fields_rows(o, g, k, geo))(
            op, gm, ktw)
        R0 = jax.vmap(lambda o, z: jnp.stack(
            [pad_field(r, geo) for r in (o.QB1, o.QB2, o.QB3, z)]))(
                op, jnp.asarray(z0t, jnp.float32))
        X = jax.vmap(lambda a: pad_field(a, geo))(
            jnp.asarray(x0, jnp.float32))
        consts = jnp.stack([
            jnp.full((B,), jnp.float32(tol) ** 2),
            jnp.zeros((B,), jnp.float32),
            jnp.full((B,), jnp.float32(max_iter)),
        ], axis=1)
        hp2, wp = geo.shape
        nf = _n_fields(False, rows=True)
        scratch = [
            pltpu.VMEM((hp2, wp), jnp.float32),
            pltpu.VMEM((hp2, wp), jnp.float32),
            pltpu.VMEM((hp2, wp), jnp.float32),
            pltpu.VMEM((hp2, wp), jnp.float32),
            pltpu.VMEM((hp2, wp), jnp.float32),
            pltpu.VMEM((nf, hp2, wp), jnp.float32),
            pltpu.SMEM((1, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kernel = functools.partial(
            _kernel_vmem_v1, lam=lam, sf=sf, n_bands=geo.n_bands,
            th=geo.th, jacobi=False, rows=True)
        X_new, iters, r1 = pl.pallas_call(
            kernel,
            grid=(B, max_iter + 3),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(X.shape, X.dtype),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=pvm.VMEM_BUDGET),
            interpret=_pcg.INTERPRET,
        )(consts, X, F, R0)
    finally:
        _pcg.MASK_COLS = False
    x = jax.vmap(lambda a: unpad_field(a, geo))(X_new)
    return x[0], iters[0, 0].astype(jnp.int32), r1[0, 0]


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset
        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    cfg = SolverConfig(use_pallas=True)
    sf = int(data.sf)
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)
    lam = cfg.lam

    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, lam)
    env = dict(prob=prob, op=op)
    jax.block_until_ready(env)

    def make_chain(solver):
        def chain(k, z, e, mi):
            def body(i, carry):
                zc, ka = carry
                pr = e["prob"]
                x, kk, r1 = solver(
                    zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                    lam=lam, tol=0.0, max_iter=mi)
                return (z * (1.0 + 1e-38 * r1), ka + kk)
            return lax.fori_loop(0, k, body, (z, jnp.int32(0)))
        return jax.jit(chain, static_argnums=(0, 3))

    variants = {
        "A v1+mask": make_chain(
            functools.partial(cg_v1, mask_cols=True)),
        "B v1     ": make_chain(
            functools.partial(cg_v1, mask_cols=False)),
        "C v2 prod": make_chain(pvm.cg_pallas_vmem_fromop),
    }
    N = 8

    def timed(f, mi):
        z, k = f(N, st.z, env, mi)
        np.asarray(z)
        t0 = time.perf_counter()
        z, k = f(N, st.z, env, mi)
        np.asarray(jnp.sum(z))
        return time.perf_counter() - t0, int(np.asarray(k))

    # compile/warm every (variant, cap) first
    for name, f in variants.items():
        for mi in (25, 100):
            t, k = timed(f, mi)
            print(f"warm {name} cap{mi}: {t:.3f}s k={k}")

    best = {}
    counts = {}
    for rep in range(12):
        for name, f in variants.items():
            for mi in (25, 100):
                t, k = timed(f, mi)
                key = (name, mi)
                best[key] = min(best.get(key, 1e9), t)
                counts[key] = k

    for name in variants:
        per = ((best[(name, 100)] - best[(name, 25)])
               / (counts[(name, 100)] - counts[(name, 25)]))
        print(f"{name}  {per * 1e6:7.2f} us/iter   "
              f"(cap100 best {best[(name, 100)]:.4f}s, "
              f"k {counts[(name, 100)]})")

    # correctness cross-check: identical r1 and x across variants
    xs = {}
    for name, solver in (("A", functools.partial(cg_v1, mask_cols=True)),
                         ("B", functools.partial(cg_v1, mask_cols=False)),
                         ("C", pvm.cg_pallas_vmem_fromop)):
        x, k, r1 = jax.jit(
            lambda z, e, s=solver: s(
                z, e["op"], prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=0.0, max_iter=100))(st.z, env)
        xs[name] = (np.asarray(x), int(np.asarray(k)),
                    float(np.asarray(r1)))
    for name in ("B", "C"):
        same = np.array_equal(xs["A"][0], xs[name][0])
        print(f"x bit-identical A vs {name}: {same}   "
              f"k {xs['A'][1]} vs {xs[name][1]}   "
              f"r1 {xs['A'][2]:.6e} vs {xs[name][2]:.6e}")


if __name__ == "__main__":
    main()
