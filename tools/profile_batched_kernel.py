"""Is the lane-batched VMEM CG kernel slower per lane than the single one?

tools/profile_batched.py shows b4 at ~5.3 ms/lane-outer-iter vs single
4.1; the chained HLO census attributes ~0.5 ms/lane to J/N/rho layout
copies — this isolates the kernel's share. Interleaved cap-100 vs
cap-25 marginal differencing (the f32 residual can underflow to exact 0
at high caps and flip the in-kernel `active` predicate — differencing
two sub-cap runs avoids the trap), difference-of-bests across reps.

Run ALONE on the chip: python tools/profile_batched_kernel.py
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
from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm  # noqa: E402

B = 4


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
    stk = lambda x: jnp.stack([x] * B)
    env = dict(
        op=op, gm=prob.gm, ktw=prob.ktw, z0t=prob.z0t,
        op_b=jax.tree_util.tree_map(stk, op),
        gm_b=jax.tree_util.tree_map(stk, prob.gm),
        ktw_b=stk(prob.ktw), z0t_b=stk(prob.z0t),
    )
    jax.block_until_ready(env)
    z1 = st.z
    zB = stk(st.z)

    def chain_single(k, z, e, mi):
        def body(i, carry):
            zc, ka = carry
            x, kk, r1 = pvm.cg_pallas_vmem_fromop(
                zc, e["op"], e["gm"], e["ktw"], e["z0t"], sf=sf,
                lam=lam, tol=0.0, max_iter=mi)
            return (z * (1.0 + 1e-38 * r1), ka + kk)

        return lax.fori_loop(0, k, body, (z, jnp.int32(0)))

    def chain_batched(k, z, e, mi):
        def body(i, carry):
            zc, ka = carry
            x, kk, r1 = pvm.cg_pallas_vmem_fromop_batched(
                zc, e["op_b"], e["gm_b"], e["ktw_b"], e["z0t_b"], sf=sf,
                lam=lam, tol=0.0, max_iter=mi)
            return (z * (1.0 + 1e-38 * jnp.sum(r1)), ka + jnp.sum(kk))

        return lax.fori_loop(0, k, body, (z, jnp.int32(0)))

    f1 = jax.jit(chain_single, static_argnums=(0, 3))
    fB = jax.jit(chain_batched, static_argnums=(0, 3))
    K, LO, HI_CAP, reps = 6, 25, 100, 6
    for mi in (LO, HI_CAP):
        np.asarray(f1(K, z1, env, mi)[1])
        np.asarray(fB(K, zB, env, mi)[1])
    print("warmed; in-kernel iters: single",
          int(np.asarray(f1(K, z1, env, HI_CAP)[1])) // K, "batched",
          int(np.asarray(fB(K, zB, env, HI_CAP)[1])) // K // B)

    best = {("single", mi): 1e9 for mi in (LO, HI_CAP)}
    best.update({("b", mi): 1e9 for mi in (LO, HI_CAP)})
    for rep in range(reps):
        order = [("single", f1, z1), ("b", fB, zB)]
        if rep % 2:
            order.reverse()
        for name, f, z in order:
            for mi in (LO, HI_CAP):
                t0 = time.perf_counter()
                np.asarray(f(K, z, env, mi)[1])
                best[(name, mi)] = min(best[(name, mi)],
                                       time.perf_counter() - t0)
    d1 = (best[("single", HI_CAP)] - best[("single", LO)]) / K
    dB = (best[("b", HI_CAP)] - best[("b", LO)]) / K
    it = HI_CAP - LO + 0  # marginal iterations per solve
    print(f"single  {d1 / it * 1e6:8.2f} us/CG-iter")
    print(f"b{B}      {dB / B / it * 1e6:8.2f} us/CG-iter/lane "
          f"({dB / it * 1e6:.2f} us/batch)")


if __name__ == "__main__":
    main()
