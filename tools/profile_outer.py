"""Decompose the fused outer-iteration device time on the real TPU.

Chained-marginal methodology (CLAUDE.md): never pull more than a scalar
through the tunnel inside a timed loop; time f(n_hi) - f(n_lo) chained
calls to cancel the ~60-300 ms dispatch jitter.

Reports:
  outer          ms per full outer iteration (lighting+albedo+depth+normals)
  outer_cap1     same with cg_max_iter=1  -> glue + 1 CG iter
  cg_in_context  (outer - outer_cap1) / (cap - 1) per-CG-iteration marginal
  kernel_alone   standalone pipelined fromop kernel per-iteration marginal
  phase breakdown: lighting / moments+albedo / operator-build+pack / energy
                   / normals chained marginals
"""

from __future__ import annotations

import sys
import time
sys.stdout.reconfigure(line_buffering=True)
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def marginal(f, n_lo=1, n_hi=4, reps=3):
    out = {}
    for n in (n_lo, n_hi):
        np.asarray(jnp.sum(f(n)))  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(f(n)))
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    return (out[n_hi] - out[n_lo]) / (n_hi - n_lo)


def main():
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

    def outer_loop(n, carry, prob, cfg):
        def body(i, c):
            z, rho, s = c
            st2 = srps.srps_iteration(
                st._replace(z=z, rho=rho, s=s), prob, sf, cfg)
            return (st2.z, st2.rho, st2.s)
        return lax.fori_loop(0, n, body, carry)[0]

    carry = (st.z, st.rho, st.s)
    f_outer = jax.jit(outer_loop, static_argnums=(0, 3))
    ms_outer = marginal(lambda n: f_outer(n, carry, prob, cfg)) * 1e3
    print(f"outer               {ms_outer:8.3f} ms/iter")

    cfg1 = SolverConfig(use_pallas=True, cg_max_iter=1)
    ms_outer1 = marginal(lambda n: f_outer(n, carry, prob, cfg1)) * 1e3
    print(f"outer_cap1 (glue)   {ms_outer1:8.3f} ms/iter")
    print(f"cg_in_context       {(ms_outer - ms_outer1) / 100 * 1e3:8.1f} "
          f"us/cg-iter  (over {cfg.cg_max_iter + 1} - 2 iters)")

    # Standalone kernel marginal (fromop, like the solve path uses).
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
        cg_pallas_pipelined_fromop)

    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)

    def cg_loop(n, z, mi):
        def body(i, zc):
            x, k, r1 = cg_pallas_pipelined_fromop(
                zc, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=cfg.lam,
                tol=1e-30, max_iter=mi)
            return x
        return lax.fori_loop(0, n, body, z)

    f_cg = jax.jit(cg_loop, static_argnums=(0, 2))
    s100 = marginal(lambda n: f_cg(n, st.z, 100), n_lo=1, n_hi=3)
    s25 = marginal(lambda n: f_cg(n, st.z, 25), n_lo=1, n_hi=3)
    print(f"kernel chained      {(s100 - s25) / 75 * 1e6:8.1f} us/cg-iter "
          f"(marginal 25->100 cap, launch+pack excluded)")
    print(f"kernel launch+pack  {(s25 - 25 * (s100 - s25) / 75) * 1e3:8.3f} "
          f"ms/call (fixed cost incl. F/R0/T pack)")

    # Phase marginals: run phase subsets in a chained loop.
    def phases_loop(n, carry, which):
        def body(i, c):
            z, rho, s = c
            stc = st._replace(z=z, rho=rho, s=s)
            if which >= 1:
                s2 = srps.estimate_lighting(prob, stc.rho, stc.N, stc.s)
            else:
                s2 = s
            if which >= 2:
                mom = srps.s_moments(prob, s2)
                rho2 = srps.estimate_albedo(prob, mom, stc.N, stc.rho)
            else:
                rho2 = rho
            if which >= 3:
                mom2 = srps.s_moments(prob, s2)
                op2 = srps.build_depth_operator(prob, mom2, rho2, stc.dz,
                                                cfg.lam)
                z2 = z + 1e-12 * (op2.P11 + op2.QB1)
            else:
                z2 = z
            if which >= 4:
                op3 = srps.build_depth_operator(prob, mom2, rho2, stc.dz,
                                                cfg.lam)
                e = srps.depth_energy(z2, op3, prob, sf, cfg.lam)
                z2 = z2 + 0.0 * e
            if which >= 5:
                from srmeetsps_cuda_tpu.ops import gradients as gradops
                from srmeetsps_cuda_tpu.ops.normals import normals_from_depth

                zx = gradops.grad_x(z2, prob.gm)
                zy = gradops.grad_y(z2, prob.gm)
                N, dz = normals_from_depth(z2, zx, zy, prob.xx, prob.yy,
                                           prob.mask, prob.fx, prob.fy)
                z2 = z2 + 0.0 * dz
            return (z2, rho2, s2)
        return lax.fori_loop(0, n, body, carry)[0]

    f_ph = jax.jit(phases_loop, static_argnums=(0, 2))
    prev = 0.0
    names = ["lighting", "+moments/albedo", "+opbuild", "+energy", "+normals"]
    for which in range(1, 6):
        ms = marginal(lambda n: f_ph(n, carry, which)) * 1e3
        print(f"{names[which - 1]:<18} {ms:8.3f} ms/iter  "
              f"(delta {ms - prev:6.3f})")
        prev = ms

    # Pack-only: build T/F/R0 exactly as the fromop wrapper does.
    from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import stack_fields_packed

    h, w = st.z.shape
    th = _pcg.pick_th(h, w, pipelined=True)
    geo = _pcg.geometry(h, w, th)

    def pack_loop(n, z):
        def body(i, zc):
            opx = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
            F = stack_fields_packed(opx, prob.gm, prob.ktw, geo)
            R0 = _pcg.pad_field(
                jnp.stack([opx.QB1, opx.QB2, opx.QB3, prob.z0t]), geo)
            T = jnp.stack([
                _pcg.pad_field(zc, geo),
                jnp.zeros(geo.shape, jnp.float32),
                jnp.zeros(geo.shape, jnp.float32),
                jnp.zeros(geo.shape, jnp.float32),
                jnp.zeros(geo.shape, jnp.float32)])
            return zc + 1e-30 * (F[0, 8, 8] + R0[0, 8, 8] + T[0, 8, 8])
        return lax.fori_loop(0, n, body, z)

    ms_pack = marginal(lambda n: jax.jit(pack_loop, static_argnums=0)(
        n, st.z)) * 1e3
    print(f"opbuild+pack only   {ms_pack:8.3f} ms/iter")


if __name__ == "__main__":
    main()
