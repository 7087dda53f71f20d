"""Jacobi-PCG evidence run: residual-vs-cost comparison on the Mitten
depth system (VERDICT r2 item 4's 'done' criterion).

Interleaved (drift-proof) measurement of the VMEM-resident kernel plain
vs Jacobi-preconditioned: per-CG-iteration cost (caps 100/25,
difference-of-bests) and the true squared residual after the cap.
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
    invd = 1.0 / srps.depth_diag(op, prob, sf, lam)
    env = dict(prob=prob, op=op, invd=invd)
    jax.block_until_ready(env)

    def chain(k, z, e, mi, jac):
        def body(i, carry):
            zc, ka = carry
            pr = e["prob"]
            x, kk, r1 = pvm.cg_pallas_vmem_fromop(
                zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                lam=lam, tol=0.0, max_iter=mi,
                invd=e["invd"] if jac else None)
            return (z * (1.0 + 1e-38 * r1), ka + kk)
        return lax.fori_loop(0, k, body, (z, jnp.int32(0)))

    f = jax.jit(chain, static_argnums=(0, 3, 4))
    N = 8

    def timed(mi, jac):
        z, k = f(N, st.z, env, mi, jac)
        np.asarray(z)
        t0 = time.perf_counter()
        z, k = f(N, st.z, env, mi, jac)
        np.asarray(jnp.sum(z))
        return time.perf_counter() - t0, int(np.asarray(k))

    for mi in (25, 100):
        for jac in (False, True):
            timed(mi, jac)  # compile/warm

    best = {}
    counts = {}
    for _ in range(10):
        for jac in (False, True):
            for mi in (25, 100):
                t, k = timed(mi, jac)
                key = (jac, mi)
                best[key] = min(best.get(key, 1e9), t)
                counts[key] = k

    # true residual after the cap: x from each solver, r = rhs - M x
    rhs = srps.depth_rhs(op, prob, sf, lam)
    for jac in (False, True):
        x, k, r1_rec = jax.jit(
            lambda z, e, j: pvm.cg_pallas_vmem_fromop(
                z, e["op"], prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=0.0, max_iter=100, invd=e["invd"] if j else None),
            static_argnums=2)(st.z, env, jac)
        r_true = rhs - srps.depth_matvec(
            x * prob.mask, op, prob, sf, lam)
        rtn = float(np.asarray(jnp.vdot(r_true, r_true)))
        per = ((best[(jac, 100)] - best[(jac, 25)])
               / (counts[(jac, 100)] - counts[(jac, 25)]))
        tag = "jacobi" if jac else "plain"
        print(f"{tag:<7} {per * 1e6:7.1f} us/iter   "
              f"true ||r||^2 after cap-100: {rtn:.6e}   "
              f"(recurrence r1 {float(np.asarray(r1_rec)):.3e})")


if __name__ == "__main__":
    main()
