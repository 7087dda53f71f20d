"""Chained-marginal comparison: streaming fromop vs VMEM-resident kernel.

Each call is one full CG solve inside a fori_loop with a loop-carried
dependency; marginals over the loop count separate per-call cost from
dispatch, and marginals over max_iter separate per-iteration cost from the
per-call fixed (pack + prologue) cost.  Run ALONE on the chip.
"""

from __future__ import annotations

import sys
import time

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def marginal(f, n_lo=1, n_hi=9, reps=4):
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
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
    diag = srps.depth_diag(op, prob, sf, cfg.lam)
    jax.block_until_ready((op, diag))
    env = dict(prob=prob, op=op, invd=1.0 / diag)

    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
        cg_pallas_pipelined_fromop)
    from srmeetsps_cuda_tpu.solve.pallas_cg_vmem import cg_pallas_vmem_fromop

    def report(name, cg, jacobi):
        def loop(n, z, e, mi):
            def body(i, zc):
                pr = e["prob"]
                x, k, r1 = cg(
                    zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf, lam=cfg.lam,
                    tol=1e-30, max_iter=mi,
                    invd=e["invd"] if jacobi else None)
                return x
            return lax.fori_loop(0, n, body, z)

        f = jax.jit(loop, static_argnums=(0, 3))
        s100 = marginal(lambda n: f(n, st.z, env, 100), n_hi=5)
        s25 = marginal(lambda n: f(n, st.z, env, 25), n_hi=5)
        per = (s100 - s25) / 75
        print(f"{name:<16} {per * 1e6:8.1f} us/iter   "
              f"fixed/call {(s25 - 25 * per) * 1e3:8.3f} ms")

    report("fromop", cg_pallas_pipelined_fromop, False)
    report("vmem", cg_pallas_vmem_fromop, False)
    report("fromop_jacobi", cg_pallas_pipelined_fromop, True)
    report("vmem_jacobi", cg_pallas_vmem_fromop, True)


if __name__ == "__main__":
    main()
