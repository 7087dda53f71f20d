"""Interleaved hardware comparison: _stencil_w row addressing — sublane
ROLLS (production) vs static SLICES of the ring-banded block
(pvm.SLICE_ROWS=True), in the full_stencil resident kernel on the Mitten
iteration-2 depth system.

Values are bit-identical by construction (rows R+di..R+di+th exist);
only the Mosaic lowering differs: roll lowers to a vreg rotate of the
whole TB-row band, the slice to an offset (relayout) read of th rows.

Per-CG-iteration cost by marginal cap differencing (100 vs 25,
difference-of-bests, interleaved). Run ALONE on the chip:
python tools/profile_sweepslice.py
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
    jax.block_until_ready(env)

    real_mode = pvm.vmem_mode
    h, w = st.z.shape
    pvm.vmem_mode = lambda *a, **k: "full_stencil"
    try:
        def chain():
            def chain_fn(k, z, e, mi):
                def body(i, carry):
                    zc, ka = carry
                    pr = e["prob"]
                    x, kk, r1 = pvm.cg_pallas_vmem_fromop(
                        zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                        lam=lam, tol=0.0, max_iter=mi)
                    return (z * (1.0 + 1e-38 * r1), ka + kk)
                return lax.fori_loop(0, k, body, (z, jnp.int32(0)))
            return jax.jit(chain_fn, static_argnums=(0, 3))

        N = 8
        fns = {}
        for variant in ("roll", "slice"):
            pvm.SLICE_ROWS = variant == "slice"
            f = chain()
            for mi in (25, 100):   # compile/warm under the flag
                z, k = f(N, st.z, env, mi)
                np.asarray(z)
            fns[variant] = f
        pvm.SLICE_ROWS = False

        def timed(variant, mi):
            z, k = fns[variant](N, st.z, env, mi)
            np.asarray(z)
            t0 = time.perf_counter()
            z, k = fns[variant](N, st.z, env, mi)
            np.asarray(jnp.sum(z))
            return time.perf_counter() - t0, int(np.asarray(k))

        best, counts = {}, {}
        for _ in range(10):
            for variant in fns:
                for mi in (25, 100):
                    t, k = timed(variant, mi)
                    best[(variant, mi)] = min(
                        best.get((variant, mi), 1e9), t)
                    counts[(variant, mi)] = k

        xs = {}
        for variant in fns:
            pvm.SLICE_ROWS = variant == "slice"
            x, k, r1 = jax.jit(
                lambda z, e: pvm.cg_pallas_vmem_fromop(
                    z, e["op"], prob.gm, prob.ktw, prob.z0t, sf=sf,
                    lam=lam, tol=0.0, max_iter=100))(st.z, env)
            xs[variant] = np.asarray(x)
            per = ((best[(variant, 100)] - best[(variant, 25)])
                   / (counts[(variant, 100)] - counts[(variant, 25)]))
            print(f"{variant:<6} {per * 1e6:7.2f} us/iter  "
                  f"(iters {counts[(variant, 25)]}/"
                  f"{counts[(variant, 100)]})")
        pvm.SLICE_ROWS = False

        d = np.abs(xs["roll"] - xs["slice"]).max()
        print(f"solution agreement after cap-100: maxdiff {d:.3e} "
              f"(expect 0 — same values, different lowering)")
    finally:
        pvm.vmem_mode = real_mode
        pvm.SLICE_ROWS = False


if __name__ == "__main__":
    main()
