"""Chained-marginal cost of the PRODUCTION srps_iteration (real config),
plus a variant with the s_moments optimization_barrier removed — measures
the net effect of layout/pack changes on the true hot path.

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

HI = jax.lax.Precision.HIGHEST


def marginal(f, args, n_lo=4, n_hi=24, reps=6):
    out = {}
    for n in (n_lo, n_hi):
        np.asarray(jnp.sum(f(n, *args)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(f(n, *args)))
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    return (out[n_hi] - out[n_lo]) / (n_hi - n_lo) * 1e3


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

    def chain(k, st0, prob):
        def body(i, s):
            s2 = srps.srps_iteration(s, prob, sf, cfg)
            # pin the energy-chain carries so nothing hoists
            return s2._replace(z=s2.z + 0.0 * s2.energy)
        return lax.fori_loop(0, k, body, st0).z

    f = jax.jit(chain)
    ms = marginal(f, (st, prob))
    print(f"production iteration        {ms:8.3f} ms/iter")

    # no-barrier variant
    orig = srps.s_moments

    def s_moments_nobar(prob, s):
        h, w = prob.mask.shape
        c = prob.I.shape[0]
        G = jnp.einsum("nck,ncl->ckl", s, s, precision=HI)
        J = jnp.einsum(
            "nck,cnp->ckp", s.astype(prob.I.dtype), prob.I,
            precision=HI, preferred_element_type=jnp.float32,
        ).reshape(c, 4, h, w)
        return srps.SMoments(G, J)

    srps.s_moments = s_moments_nobar
    try:
        f2 = jax.jit(chain)
        ms2 = marginal(f2, (st, prob))
        print(f"without J barrier           {ms2:8.3f} ms/iter")
    finally:
        srps.s_moments = orig


if __name__ == "__main__":
    main()
