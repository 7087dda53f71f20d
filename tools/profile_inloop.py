"""Is the VMEM-resident CG kernel slower INSIDE the fused outer loop?

Measures, in ONE process with interleaved reps (the chip rate drifts
tens of percent across minutes) and difference-of-bests:

  in-loop:    full srps_iteration chains at cg cap 100 vs cap 25
  standalone: chained bare kernel calls at cap 100 vs cap 25

If in-loop us/iter > standalone us/iter, the gap is XLA context around
the custom call (scoped-vmem co-residency, scheduling), not the kernel.
Run ALONE on the chip.
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

    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm

    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, lam)
    env = dict(prob=prob, op=op)
    jax.block_until_ready(op)

    def bare(k, z, e, mi):
        def body(i, carry):
            zc, ka = carry
            pr = e["prob"]
            x, kk, r1 = pvm.cg_pallas_vmem_fromop(
                zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                lam=lam, tol=0.0, max_iter=mi)
            return (z * (1.0 + 1e-38 * r1), ka + kk)
        return lax.fori_loop(0, k, body, (z, jnp.int32(0)))

    import dataclasses

    def mk_outer(mi):
        cfg2 = dataclasses.replace(cfg, cg_max_iter=mi, cg_tol=0.0)

        def f(k, st0, prob):
            def body(i, carry):
                s0, ka = carry
                s2 = srps.srps_iteration(s0, prob, sf, cfg2)
                return (s2._replace(z=s2.z + 0.0 * s2.energy),
                        ka + s2.cg_iters)
            out = lax.fori_loop(0, k, body, (st0, jnp.int32(0)))
            return out[0].z, out[1]
        return jax.jit(f, static_argnums=0)

    f_out = {mi: mk_outer(mi) for mi in (25, 100)}
    f_bare = jax.jit(bare, static_argnums=(0, 3))

    N = 8

    def timed(fn):
        z, k = fn()
        np.asarray(z)
        t0 = time.perf_counter()
        z, k = fn()
        np.asarray(jnp.sum(z))
        return time.perf_counter() - t0, int(np.asarray(k))

    # warm/compile
    runs = {
        ("inloop", 25): lambda: f_out[25](N, st, prob),
        ("inloop", 100): lambda: f_out[100](N, st, prob),
        ("bare", 25): lambda: f_bare(N, st.z, env, 25),
        ("bare", 100): lambda: f_bare(N, st.z, env, 100),
    }
    for fn in runs.values():
        timed(fn)

    best = {k: 1e9 for k in runs}
    counts = {}
    for _ in range(10):
        for key, fn in runs.items():
            t, k = timed(fn)
            best[key] = min(best[key], t)
            counts[key] = k
    for tag in ("inloop", "bare"):
        dt = best[(tag, 100)] - best[(tag, 25)]
        dk = counts[(tag, 100)] - counts[(tag, 25)]
        print(f"{tag:<8} {dt / dk * 1e6:8.1f} us/CG-iter   "
              f"cg {counts[(tag, 25)]}/{counts[(tag, 100)]}   "
              f"t25 {best[(tag, 25)] * 1e3:7.2f} ms  t100 "
              f"{best[(tag, 100)] * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
