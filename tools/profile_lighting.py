"""Decompose estimate_lighting's device cost and test ATb einsum layouts.

Chained-marginal methodology (CLAUDE.md): time f(n_hi) - f(n_lo) chained
calls to cancel the axon tunnel's dispatch jitter.
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
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402

HI = lax.Precision.HIGHEST


def marginal(f, n_lo=2, n_hi=10, reps=4):
    out = {}
    for n in (n_lo, n_hi):
        np.asarray(jnp.sum(f(n)))  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(f(n)))
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    return (out[n_hi] - out[n_lo]) / (n_hi - n_lo)


def main():
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    cfg = SolverConfig(use_pallas=True)
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, int(data.sf), cfg)
    np.asarray(st.z)
    h, w = prob.mask.shape
    c, n = prob.I.shape[:2]
    P = h * w
    rho, N = st.rho, st.N

    # Closure-captured device arrays are embedded into the serialized
    # module and blow the remote-compile HTTP body limit — pass all data
    # as explicit jit args.
    def chain(body):
        def f(k, x0, *data):
            return lax.fori_loop(0, k, lambda i, x: body(x, *data), x0)
        return jax.jit(f, static_argnums=0)

    # 1. full estimate_lighting as-is
    f1 = chain(lambda s, prob, rho, N: srps.estimate_lighting(
        prob, rho, N, s).sum() * 1e-20 + s * 0.5)
    ms = marginal(lambda k: f1(k, st.s, prob, rho, N)) * 1e3
    print(f"lighting (current)      {ms:8.3f} ms/iter")

    # 2. ATA-only pass
    rf = rho.reshape(c, P)
    Nf = N.reshape(4, P)

    def ata_only(x, rf, Nf):
        r2 = rf * rf + x * 1e-30
        outs = []
        for a in range(4):
            for b in range(a, 4):
                outs.append(jnp.sum(r2 * (Nf[a] * Nf[b]), axis=1))
        return jnp.stack(outs).sum() * 1e-20 + x * 0.5
    f2 = chain(ata_only)
    ms = marginal(lambda k: f2(k, jnp.float32(1.0), rf, Nf)) * 1e3
    print(f"ATA reductions only     {ms:8.3f} ms/iter")

    # 3. ATb current form: T (c,4,P), einsum "cap,cnp->nca"
    def atb_cur(x, rf, Nf, I):
        T = (rf[:, None] * Nf[None, :]) + x * 1e-30
        ATb = jnp.einsum("cap,cnp->nca", T, I, precision=HI,
                         preferred_element_type=jnp.float32)
        return ATb.sum() * 1e-20 + x * 0.5
    f3 = chain(atb_cur)
    ms = marginal(lambda k: f3(k, jnp.float32(1.0), rf, Nf, prob.I)) * 1e3
    print(f"ATb cur  cap,cnp->nca   {ms:8.3f} ms/iter")

    # 4. ATb canonical matmul: T2 (c,P,4), einsum "cnp,cpa->cna"
    def atb_mm(x, rf, Nf, I):
        T2 = (rf[:, :, None] * Nf.T[None]) + x * 1e-30  # (c,P,4)
        ATb = jnp.einsum("cnp,cpa->cna", I, T2, precision=HI,
                         preferred_element_type=jnp.float32)
        return ATb.sum() * 1e-20 + x * 0.5
    f4 = chain(atb_mm)
    ms = marginal(lambda k: f4(k, jnp.float32(1.0), rf, Nf, prob.I)) * 1e3
    print(f"ATb mm   cnp,cpa->cna   {ms:8.3f} ms/iter")

    # 5. s_moments J pass for reference
    def j_only(x, s, I):
        J = jnp.einsum("nck,cnp->ckp", s + x * 1e-30, I,
                       precision=HI, preferred_element_type=jnp.float32)
        return J.sum() * 1e-20 + x * 0.5
    f5 = chain(j_only)
    ms = marginal(lambda k: f5(k, jnp.float32(1.0), st.s, prob.I)) * 1e3
    print(f"J einsum nck,cnp->ckp   {ms:8.3f} ms/iter")

    # 6. raw single pass over I (roofline floor)
    def i_pass(x, I):
        return jnp.sum(I * (1.0 + x * 1e-30),
                       axis=(0, 1)).sum() * 1e-20 + x * 0.5
    f6 = chain(i_pass)
    ms = marginal(lambda k: f6(k, jnp.float32(1.0), prob.I)) * 1e3
    print(f"raw I reduction pass    {ms:8.3f} ms/iter "
          f"({prob.I.nbytes / 1e6:.0f} MB)")


if __name__ == "__main__":
    main()
