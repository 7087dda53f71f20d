"""Interleaved hardware comparison at SF=4: VMEM-resident CG with the
direct mask-gated matvec ("full") vs the sf=4 stencil mode
("full_stencil": 9-point lam*A^T A collapse + resident-ktw tilesum term),
on the Mitten iteration-2 depth system with the depth further decimated
(bench.py sf4 workload).

Per-CG-iteration cost by marginal cap differencing (100 vs 25,
difference-of-bests, interleaved so chip-rate drift hits both kernels
equally). Also checks the two kernels agree on the solution.

Run ALONE on the chip: python tools/profile_stencil4.py
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


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import (  # noqa: E402
            ProblemData, load_image_dataset)

        d2 = load_image_dataset(ds)
        data = ProblemData(I=d2.I, K=d2.K, mask=d2.mask, sf=4,
                           z0=d2.z0[:, ::2, ::2])
    else:
        data = synthetic_dataset(sf=4)
    cfg = SolverConfig(use_pallas=True)
    sf = int(data.sf)
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)
    lam = cfg.lam

    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm

    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, lam)
    env = dict(prob=prob, op=op)
    jax.block_until_ready(env)

    real_mode = pvm.vmem_mode
    h, w = st.z.shape
    print("natural mode:", real_mode(h, w, sf, _check_backend=False))

    def chain_for(mode):
        pvm.vmem_mode = lambda *a, **k: mode

        def chain(k, z, e, mi):
            def body(i, carry):
                zc, ka = carry
                pr = e["prob"]
                x, kk, r1 = pvm.cg_pallas_vmem_fromop(
                    zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                    lam=lam, tol=0.0, max_iter=mi)
                return (z * (1.0 + 1e-38 * r1), ka + kk)
            return lax.fori_loop(0, k, body, (z, jnp.int32(0)))

        f = jax.jit(chain, static_argnums=(0, 3))
        pvm.vmem_mode = real_mode
        return f

    fns = {m: chain_for(m) for m in ("full", "full_stencil")}
    N = 8

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
            pvm.vmem_mode = real_mode

    for mode in fns:
        for mi in (25, 100):
            timed(mode, mi)  # compile/warm

    best, counts = {}, {}
    for _ in range(10):
        for mode in fns:
            for mi in (25, 100):
                t, k = timed(mode, mi)
                best[(mode, mi)] = min(best.get((mode, mi), 1e9), t)
                counts[(mode, mi)] = k

    xs = {}
    # gm/ktw/z0t ride in the jit ARGS (closing over device arrays embeds
    # them in the serialized module — axon 413 risk, CLAUDE.md).
    env_acc = dict(env, gm=prob.gm, ktw=prob.ktw, z0t=prob.z0t)
    for mode in fns:
        pvm.vmem_mode = lambda *a, **k: mode
        x, k, r1 = jax.jit(
            lambda z, e: pvm.cg_pallas_vmem_fromop(
                z, e["op"], e["gm"], e["ktw"], e["z0t"], sf=sf, lam=lam,
                tol=0.0, max_iter=100))(st.z, env_acc)
        pvm.vmem_mode = real_mode
        xs[mode] = np.asarray(x)
        per = ((best[(mode, 100)] - best[(mode, 25)])
               / (counts[(mode, 100)] - counts[(mode, 25)]))
        print(f"{mode:<13} {per * 1e6:7.2f} us/iter  "
              f"(iters {counts[(mode, 25)]}/{counts[(mode, 100)]})")

    d = np.abs(xs["full"] - xs["full_stencil"]).max()
    s = np.abs(xs["full"]).max()
    print(f"solution agreement after cap-100: maxdiff {d:.3e} "
          f"(scale {s:.3e})")


if __name__ == "__main__":
    main()
