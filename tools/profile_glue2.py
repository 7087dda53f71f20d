"""Cumulative-prefix decomposition of the outer-iteration glue.

Each chained program runs a PREFIX of the real srps_iteration pipeline;
consecutive deltas isolate each stage. All device data is passed as jit
args (closure-captured arrays get embedded into the serialized module:
they blow the remote-compile body limit AND distort while-loop costs).
"""

from __future__ import annotations

import sys
import time

sys.stdout.reconfigure(line_buffering=True)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.ops import gradients as gradops  # noqa: E402
from srmeetsps_cuda_tpu.ops.normals import normals_from_depth  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def marginal(f, n_lo=2, n_hi=12, reps=4):
    out = {}
    for n in (n_lo, n_hi):
        np.asarray(jnp.sum(f(n)))
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
    lam = cfg.lam

    from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg
    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as _pvm
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import stack_fields_packed

    h, w = st.z.shape
    th = _pvm.vmem_th(h, w)
    geo = _pcg.geometry(h, w, th)

    def prefix(stage):
        """stage: how far through the iteration to run."""

        def body(c, prob, dzf):
            z, rho, s = c
            s = srps.estimate_lighting(prob, rho, st.N, s)
            if stage == "lighting":
                return (z, rho, s)
            mom = srps.s_moments(prob, s)
            rho = srps.estimate_albedo(prob, mom, st.N, rho)
            if stage == "albedo":
                return (z, rho, s)
            op = srps.build_depth_operator(prob, mom, rho, dzf, lam)
            if stage == "opbuild":
                return (z + 1e-20 * (op.P11[0, 0] + op.QB1[0, 0]), rho, s)
            if stage == "pack":
                F = stack_fields_packed(op, prob.gm, prob.ktw, geo)
                R0 = _pcg.pad_field(
                    jnp.stack([op.QB1, op.QB2, op.QB3, prob.z0t]), geo)
                X = _pcg.pad_field(z, geo)
                return (z + 1e-20 * (F[0, 8, 8] + R0[0, 8, 8] + X[8, 8]),
                        rho, s)
            if stage in ("cg1", "cg0"):
                mi = 1 if stage == "cg1" else 0
                x, iters, _ = _pvm.cg_pallas_vmem_fromop(
                    z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                    tol=cfg.cg_tol, max_iter=mi)
                return (x * prob.mask, rho, s)
            # full tail: cg cap1 + energy + normals
            x, iters, _ = _pvm.cg_pallas_vmem_fromop(
                z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=cfg.cg_tol, max_iter=1)
            z2 = x * prob.mask
            e = srps.depth_energy(z2, op, prob, sf, lam)
            zx = gradops.grad_x(z2, prob.gm)
            zy = gradops.grad_y(z2, prob.gm)
            N, dz2 = normals_from_depth(z2, zx, zy, prob.xx, prob.yy,
                                        prob.mask, prob.fx, prob.fy)
            return (z2 + 1e-20 * (e + dz2[0, 0] + N[0, 0, 0]), rho, s)

        def f(k, c0, prob, dzf):
            return lax.fori_loop(
                0, k, lambda i, c: body(c, prob, dzf), c0)[0]
        return jax.jit(f, static_argnums=0)

    c0 = (st.z, st.rho, st.s)
    prev = 0.0
    for stage in ("lighting", "albedo", "opbuild", "pack", "cg0", "cg1",
                  "full1"):
        fp = prefix(stage)
        ms = marginal(lambda k: fp(k, c0, prob, st.dz)) * 1e3
        print(f"{stage:<10} {ms:8.3f} ms/iter  (delta {ms - prev:+7.3f})")
        prev = ms


if __name__ == "__main__":
    main()
