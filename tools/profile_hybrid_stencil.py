"""Interleaved hardware comparison of the residency modes on larger
grids, forced per mode on the SAME problem:

  * 1088x1920 (1080p-class, BASELINE config 5's size): hybrid (packed-F
    re-stream, the old route) vs hybrid_stencil (streamed C planes).
  * 1024x1664 (mid-size): full_packed (all-resident packed F, the old
    route) vs hybrid_stencil — is streaming 9 C rows + 9 FMAs faster
    than zero-DMA but 40-op sweeps?

Marginal cap differencing (100 vs 25) over N-chained calls.
Run ALONE on the chip: python tools/profile_hybrid_stencil.py
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

from bench import synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402
from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm  # noqa: E402


def measure(h, w, modes, n_images=8):
    data = synthetic_dataset(h=h, w=w, sf=2, n=n_images)
    cfg = SolverConfig(use_pallas=True)
    sf = 2
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, 1.0)
    env = dict(prob=prob, op=op)
    jax.block_until_ready(env)
    real = pvm.vmem_mode
    print(f"\n== {h}x{w} (natural mode: "
          f"{real(h, w, sf, _check_backend=False)}) ==")

    def chain(k, z, e, mi):
        def body(i, carry):
            zc, ka = carry
            pr = e["prob"]
            x, kk, r1 = pvm.cg_pallas_vmem_fromop(
                zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                lam=1.0, tol=0.0, max_iter=mi)
            return (z * (1.0 + 1e-38 * r1), ka + kk)
        return lax.fori_loop(0, k, body, (z, jnp.int32(0)))

    fns = {}
    for mode in modes:
        pvm.vmem_mode = lambda *a, **k: mode
        try:
            fns[mode] = jax.jit(chain, static_argnums=(0, 3))
        finally:
            pvm.vmem_mode = real
    N = 6

    def timed(mode, mi):
        pvm.vmem_mode = lambda *a, **k: mode
        try:
            z, k = fns[mode](N, st.z, env, mi)
            np.asarray(z)
            t0 = time.perf_counter()
            z, k = fns[mode](N, st.z, env, mi)
            np.asarray(jnp.sum(z))
            return time.perf_counter() - t0, int(np.asarray(k))
        finally:
            pvm.vmem_mode = real

    for mode in modes:
        for mi in (25, 100):
            timed(mode, mi)  # compile + warm

    best, counts = {}, {}
    for _ in range(8):
        for mode in modes:
            for mi in (25, 100):
                t, k = timed(mode, mi)
                best[(mode, mi)] = min(best.get((mode, mi), 1e9), t)
                counts[(mode, mi)] = k

    xs = {}
    for mode in modes:
        pvm.vmem_mode = lambda *a, **k: mode
        try:
            x, k, _ = jax.jit(lambda z, e: pvm.cg_pallas_vmem_fromop(
                z, e["op"], prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=0.0, max_iter=50))(st.z, env)
        finally:
            pvm.vmem_mode = real
        xs[mode] = np.asarray(x)
        per = ((best[(mode, 100)] - best[(mode, 25)])
               / (counts[(mode, 100)] - counts[(mode, 25)]))
        print(f"{mode:<15} {per * 1e6:7.2f} us/iter  "
              f"(iters {counts[(mode, 25)]}/{counts[(mode, 100)]})")
    ms = list(modes)
    d = np.abs(xs[ms[0]] - xs[ms[1]]).max()
    print(f"solution maxdiff after cap-50: {d:.3e} "
          f"(scale {np.abs(xs[ms[0]]).max():.3e})")


def main():
    _enable_compile_cache()
    measure(1088, 1920, ("hybrid", "hybrid_stencil"))
    measure(1024, 1664, ("full_packed", "hybrid_stencil"))


if __name__ == "__main__":
    main()
