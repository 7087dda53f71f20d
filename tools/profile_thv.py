"""Band-height (TH_V) sweep for the VMEM-resident CG kernel.

The sweep bands are statically unrolled; taller bands mean fewer per-band
fixed costs (slice bookkeeping, ring recompute overlap) but larger live
temporaries. Measures us/CG-iteration at each candidate height via
chained-call marginals (dispatch cancels).  Run ALONE on the chip.
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

from bench import find_dataset, synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def marginal(f, n_lo=1, n_hi=5, reps=4):
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
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
    jax.block_until_ready(op)
    env = dict(prob=prob, op=op)

    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm

    h, w = st.z.shape
    for th in (32, 64, 96, 128):
        pvm.TH_V = th  # geometry() pads hp up to a multiple of th

        def loop(n, z, e, mi):
            def body(i, zc):
                pr = e["prob"]
                x, k, r1 = pvm.cg_pallas_vmem_fromop(
                    zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                    lam=cfg.lam, tol=1e-30, max_iter=mi)
                return x
            return lax.fori_loop(0, n, body, z)

        f = jax.jit(loop, static_argnums=(0, 3))
        s100 = marginal(lambda n: f(n, st.z, env, 100))
        s25 = marginal(lambda n: f(n, st.z, env, 25))
        per = (s100 - s25) / 75
        print(f"th={th:<4} {per * 1e6:8.1f} us/iter   "
              f"fixed/call {(s25 - 25 * per) * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
