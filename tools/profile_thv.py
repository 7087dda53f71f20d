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


def timed(f, n):
    z, k = f(n)
    np.asarray(z)
    t0 = time.perf_counter()
    z, k = f(n)
    np.asarray(jnp.sum(z))
    return time.perf_counter() - t0, int(np.asarray(k))


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
    # Compile one chained-loop program per candidate height, then time
    # them INTERLEAVED: the chip's effective rate drifts by tens of
    # percent over minutes (sequential sweeps disagreed 2x run-to-run
    # with the in-kernel iteration counter proving identical work), so
    # only paired same-minute comparisons are meaningful.
    fns = {}
    for th in (24, 32, 48, 64):
        pvm.TH_V = th  # geometry() pads hp up to a multiple of th

        def loop(n, z, e, mi):
            # Restart every chained call from (numerically) the same warm
            # start: carrying x would converge across calls, underflow the
            # f32 residual to exact 0 and trip the kernel's predicated
            # skip — marginals then measure skipped iterations (th=48
            # once read an impossible 7.7 us/iter this way). The r1 drift
            # keeps a carry dependence so nothing hoists, and the summed
            # in-kernel iteration count is returned so any skip is visible.
            def body(i, carry):
                zc, ka = carry
                pr = e["prob"]
                x, k, r1 = pvm.cg_pallas_vmem_fromop(
                    zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf,
                    lam=cfg.lam, tol=1e-30, max_iter=mi)
                return (z * (1.0 + 1e-38 * r1), ka + k)
            return lax.fori_loop(0, n, body, (z, jnp.int32(0)))

        f = jax.jit(loop, static_argnums=(0, 3))
        n_chain = 8
        # warm/compile both cap variants now
        for mi in (25, 100):
            timed(lambda n, _mi=mi: f(n, st.z, env, _mi), n_chain)
        fns[th] = f

    reps = 10
    best100 = {th: 1e9 for th in fns}
    best25 = {th: 1e9 for th in fns}
    counts = {}
    for _ in range(reps):
        for th, f in fns.items():
            t100, k100 = timed(lambda n: f(n, st.z, env, 100), 8)
            t25, k25 = timed(lambda n: f(n, st.z, env, 25), 8)
            counts[th] = (k25, k100)
            # difference-of-bests, NOT best-of-differences: min over reps
            # of (t100 - t25) pairs a lucky t100 with an unlucky t25 and
            # biases the marginal toward 0 (th=64 once read 6.7 us/iter).
            best100[th] = min(best100[th], t100)
            best25[th] = min(best25[th], t25)
    for th in fns:
        k25, k100 = counts[th]
        per = (best100[th] - best25[th]) / (k100 - k25)
        print(f"th={th:<4} {per * 1e6:8.1f} us/iter   "
              f"cg/chain {k25}/{k100}")


if __name__ == "__main__":
    main()
