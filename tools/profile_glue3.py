"""Ablation decomposition of the outer iteration: run the FULL iteration
with exactly one stage stubbed out, so every other stage stays live in the
loop (prefix chains get loop-hoisted when a carry stops evolving:
tools/profile_glue2.py's early stages measure ~0).

Stubs keep downstream shapes/dependencies via cheap surrogates that
depend on the same carries, so XLA cannot hoist the remaining stages.
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


def marginal(f, n_lo=4, n_hi=24, reps=6):
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
    from bench import _enable_compile_cache

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

    c, n = prob.I.shape[:2]
    h, w = st.z.shape

    def iteration(c0, prob, dzf, skip, cg_iters):
        z, rho, s, N = c0
        # --- lighting ---
        if skip == "lighting":
            s = s * 0.999 + 1e-6  # evolves, depends on carry, ~free
        else:
            s = srps.estimate_lighting(prob, rho, N, s)
        # --- moments (J streams I) ---
        if skip == "moments":
            G = jnp.einsum("nck,ncl->ckl", s, s)
            J = jnp.broadcast_to(
                (s.sum() * 1e-20 + rho[:, :1, :1]).reshape(c, 1, 1),
                (c, 4, h * w)) * 1.0
            mom = srps.SMoments(G, J)
        else:
            mom = srps.s_moments(prob, s)
        # --- albedo ---
        if skip == "albedo":
            rho = rho * 0.999 + mom.J[:, 0].reshape(c, h, w) * 1e-20
        else:
            rho = srps.estimate_albedo(prob, mom, N, rho)
        # --- depth operator build ---
        op = srps.build_depth_operator(prob, mom, rho, dzf, lam)
        if skip == "opbuild":
            f0 = rho[0] + mom.J[0, 0].reshape(h, w) * 1e-20
            op = srps.DepthOperator(*( [f0] * 9 ), const=jnp.float32(0.0))
        # --- CG (pack + prologue + iters + epilogue) ---
        if skip == "cg":
            z2 = z * 0.999 + op.P11 * 1e-20
        else:
            # tol=0: never early-exit. Stage stubs degenerate the linear
            # system, and with a real tol the kernel's in-kernel
            # convergence exit then skips most of the 100 iterations —
            # ~3.5 ms of CG savings get misattributed to the stubbed
            # stage (the original 'moments +4.2 ms' artifact).
            x, iters, _ = _pvm.cg_pallas_vmem_fromop(
                z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=0.0, max_iter=cg_iters)
            z2 = x * prob.mask
        # --- energy ---
        if skip == "energy":
            e = jnp.sum(z2) * 1e-20
        else:
            e = srps.depth_energy(z2, op, prob, sf, lam)
        # --- normals ---
        if skip == "normals":
            N2 = N * 0.999 + z2[None] * 1e-20
        else:
            zx = gradops.grad_x(z2, prob.gm)
            zy = gradops.grad_y(z2, prob.gm)
            N2, _ = normals_from_depth(z2, zx, zy, prob.xx, prob.yy,
                                       prob.mask, prob.fx, prob.fy)
            N2 = N2 + 0.0 * e
        return (z2 + 1e-20 * e, rho, s, N2)

    def make(skip, cg_iters=1):
        # k is dynamic (fori_loop takes a traced bound) so one compile
        # serves every chain length.
        def f(k, c0, prob, dzf):
            return lax.fori_loop(
                0, k,
                lambda i, cc: iteration(cc, prob, dzf, skip, cg_iters),
                c0)[0]
        return jax.jit(f)

    # Ablate against the cap-100 base (the production configuration):
    # cap-1 chains measure pathologically slow (~32 ms/iter vs 8.5 at
    # cap-100, reproducibly) — whatever that artifact is, deltas against
    # it would misattribute the glue.
    #
    # Build each jitted program ONCE and reuse it across the timed calls:
    # make() returns a fresh closure, and a fresh jax.jit wrapper would
    # retrace on every call (the timings then measure tracing, not the
    # device program — the symptom is a *negative* marginal).
    c0 = (st.z, st.rho, st.s, st.N)
    f_base = make(None, cg_iters=100)
    base = marginal(lambda k: f_base(k, c0, prob, st.dz)) * 1e3
    print(f"full (cg cap100)   {base:8.3f} ms/iter")
    for skip in ("lighting", "moments", "albedo", "opbuild", "cg",
                 "energy", "normals"):
        f_skip = make(skip, cg_iters=100)
        ms = marginal(lambda k: f_skip(k, c0, prob, st.dz)) * 1e3
        print(f"minus {skip:<12} {ms:8.3f} ms/iter  (stage cost "
              f"{base - ms:+7.3f})")


if __name__ == "__main__":
    main()
