"""Outer-iteration stage ablation, take 3 — NON-DEGENERATE stubs.

tools/profile_glue3.py's stubs degenerate the linear system; the
VMEM-resident kernel's `active` gate (pallas_cg_vmem.py:251) then goes
false on a NaN/zero residual EVEN AT tol=0 and the remaining ~100
predicated grid steps cost nothing — so stub deltas silently include
most of the 3.6 ms CG cost (the 'moments +3.9 ms' artifact, round 2).

Here each stubbed stage is replaced by its REAL converged value
(precomputed outside the loop, passed as a jit argument) plus a 0-weight
carry dependence that blocks loop hoisting without changing the numerics.
The linear system stays well-conditioned, and the CG iteration count is
accumulated into the carry and printed per variant — any variant whose
iters/outer differ from the base is flagged as untrustworthy.

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
from srmeetsps_cuda_tpu.ops import gradients as gradops  # noqa: E402
from srmeetsps_cuda_tpu.ops.normals import normals_from_depth  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402

HI = jax.lax.Precision.HIGHEST


def marginal(f, args, n_lo=4, n_hi=24, reps=6):
    out = {}
    iters = {}
    for n in (n_lo, n_hi):
        z, it = f(n, *args)
        np.asarray(z)
        iters[n] = float(np.asarray(it))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            z, it = f(n, *args)
            np.asarray(z)
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    ms = (out[n_hi] - out[n_lo]) / (n_hi - n_lo) * 1e3
    cg_per = (iters[n_hi] - iters[n_lo]) / (n_hi - n_lo)
    return ms, cg_per


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

    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as _pvm

    h, w = st.z.shape

    # Realistic fixed stage outputs (state after one real iteration).
    s_fix = st.s
    mom_fix = srps.s_moments(prob, s_fix)
    rho_fix = st.rho
    op_fix = srps.build_depth_operator(prob, mom_fix, rho_fix, st.dz, lam)
    fixed = dict(s=s_fix, mom=mom_fix, rho=rho_fix, op=op_fix)
    jax.block_until_ready(fixed)

    def iteration(c0, prob, dzf, fixed, skip):
        z, rho, s, N, it_acc = c0
        # 0-weight carry dependence: keeps stubbed stages inside the loop
        # (blocks hoisting) without perturbing the numerics.
        eps = 0.0 * jnp.sum(z[0])
        if skip == "lighting":
            s = fixed["s"] + eps
        else:
            s = srps.estimate_lighting(prob, rho, N, s)
        if skip == "moments":
            mom = srps.SMoments(fixed["mom"].G + eps, fixed["mom"].J + eps)
        else:
            mom = srps.s_moments(prob, s)
        if skip == "albedo":
            rho = fixed["rho"] + eps
        else:
            rho = srps.estimate_albedo(prob, mom, N, rho)
        if skip == "opbuild":
            opf = fixed["op"]
            op = srps.DepthOperator(
                opf.P11 + eps, opf.P12, opf.P13, opf.P22, opf.P23,
                opf.P33, opf.QB1, opf.QB2, opf.QB3, opf.const)
        else:
            op = srps.build_depth_operator(prob, mom, rho, dzf, lam)
        if skip == "cg":
            z2 = z * 0.999 + op.P11 * 1e-20
            iters = jnp.int32(0)
        else:
            x, iters, _ = _pvm.cg_pallas_vmem_fromop(
                z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=0.0, max_iter=100)
            z2 = x * prob.mask
        if skip == "energy":
            e = jnp.sum(z2) * 1e-20
        else:
            e = srps.depth_energy(z2, op, prob, sf, lam)
        if skip == "normals":
            N2 = N * 0.999 + z2[None] * 1e-20
        else:
            zx = gradops.grad_x(z2, prob.gm)
            zy = gradops.grad_y(z2, prob.gm)
            N2, _ = normals_from_depth(z2, zx, zy, prob.xx, prob.yy,
                                       prob.mask, prob.fx, prob.fy)
            N2 = N2 + 0.0 * e
        return (z2 + 1e-20 * e, rho, s, N2, it_acc + iters)

    def make(skip):
        def f(k, c0, prob, dzf, fixed):
            out = lax.fori_loop(
                0, k,
                lambda i, cc: iteration(cc, prob, dzf, fixed, skip),
                c0)
            return out[0], out[4]
        return jax.jit(f)

    c0 = (st.z, st.rho, st.s, st.N, jnp.int32(0))
    f_base = make(None)
    base, cg_base = marginal(f_base, (c0, prob, st.dz, fixed))
    print(f"full               {base:8.3f} ms/iter   cg/outer {cg_base:6.1f}")
    for skip in ("lighting", "moments", "albedo", "opbuild", "cg",
                 "energy", "normals"):
        f_skip = make(skip)
        ms, cgp = marginal(f_skip, (c0, prob, st.dz, fixed))
        flag = "" if (skip == "cg" or abs(cgp - cg_base) < 2) else "  <-- UNTRUSTWORTHY (cg count shifted)"
        print(f"minus {skip:<12} {ms:8.3f} ms/iter   cg/outer {cgp:6.1f}"
              f"  (stage cost {base - ms:+7.3f}){flag}")


if __name__ == "__main__":
    main()
