"""Per-grid-step rate of each CG kernel variant under ONE harness.

Usage: python tools/profile_kernels.py [lo hi]
Marginal between two iteration caps of jitted single calls (bench.py's
method), per variant: plain pipelined, fromop, cgs, jacobi.
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

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 400
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
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
    rhs = srps.depth_rhs(op, prob, sf, cfg.lam)
    b_res = rhs - srps.depth_matvec(st.z, op, prob, sf, cfg.lam)
    diag = srps.depth_diag(op, prob, sf, cfg.lam)
    jax.block_until_ready((op, b_res, diag))

    from srmeetsps_cuda_tpu.solve.pallas_cg_cgs import cg_pallas_cgs
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
        cg_pallas_pipelined, cg_pallas_pipelined_fromop)

    def timed(f, args, reps=5):
        np.asarray(f(*args)[0].sum())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(*args)[0].sum())
            best = min(best, time.perf_counter() - t0)
        return best

    def report(name, fn, args, static_kw):
        # operands as jit ARGUMENTS (constants embed + fold differently)
        times = {}
        for mi in (lo, hi):
            f = jax.jit(functools.partial(fn, **static_kw, max_iter=mi))
            times[mi] = timed(f, args)
        per = (times[hi] - times[lo]) / (hi - lo)
        print(f"{name:<12} {per * 1e6:8.1f} us/iter   "
              f"(t{lo}={times[lo] * 1e3:.1f} ms, "
              f"t{hi}={times[hi] * 1e3:.1f} ms)")

    kw = dict(sf=sf, lam=cfg.lam, tol=1e-30)
    report("plain", cg_pallas_pipelined,
           (st.z, b_res, op, prob.gm, prob.ktw), kw)
    report("fromop", cg_pallas_pipelined_fromop,
           (st.z, op, prob.gm, prob.ktw, prob.z0t), kw)
    report("jacobi", cg_pallas_pipelined_fromop,
           (st.z, op, prob.gm, prob.ktw, prob.z0t),
           dict(**kw, invd=1.0 / diag))
    report("cgs", cg_pallas_cgs,
           (st.z, op, prob.gm, prob.ktw, prob.z0t), kw)

    from srmeetsps_cuda_tpu.solve.pallas_cg_vmem import (
        cg_pallas_vmem_fromop, supported_vmem)

    h, w = np.asarray(prob.mask).shape
    if supported_vmem(h, w, sf):
        report("vmem", cg_pallas_vmem_fromop,
               (st.z, op, prob.gm, prob.ktw, prob.z0t), kw)
        report("vmem_jacobi", cg_pallas_vmem_fromop,
               (st.z, op, prob.gm, prob.ktw, prob.z0t),
               dict(**kw, invd=1.0 / diag))
    else:
        print(f"vmem         unsupported at {h}x{w}")


if __name__ == "__main__":
    main()
