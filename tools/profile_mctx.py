"""In-CONTEXT bisect of the ~3.9 ms the glue ablation charges to the
moments stage (tools/profile_glue3.py), which contradicts the isolated
J-einsum measurement (0.21 ms, tools/profile_moments.py).

Runs the FULL outer iteration (tol=0 CG, all stages live) with only the
moments stage's J computation swapped between lowering variants, plus one
variant that keeps the real einsum but stubs J's consumers (albedo num,
B_k fields, const) — separating "the einsum is slow in context" from
"J's consumers/layout are slow".  Run ALONE on the chip.
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

    c, n_img = prob.I.shape[:2]
    h, w = st.z.shape
    P = h * w

    def j_einsum(s, I):
        return jnp.einsum("nck,cnp->ckp", s.astype(I.dtype), I,
                          precision=HI, preferred_element_type=jnp.float32)

    def j_unroll(s, I):
        s32 = s.astype(jnp.float32)
        return sum(s32[i][:, :, None] * I[:, i, None, :].astype(jnp.float32)
                   for i in range(n_img))

    def j_dot(s, I):
        sT = jnp.transpose(s, (1, 2, 0)).astype(I.dtype)  # (c,4,n)
        return lax.dot_general(
            sT, I, (((2,), (1,)), ((0,), (0,))), precision=HI,
            preferred_element_type=jnp.float32)

    def j_einsum_bar(s, I):
        # Hypothesis fix: barrier forces ONE materialisation of J so XLA
        # cannot fuse the 295 MB I-contraction into each consumer
        # (albedo num, B0/B1/B2, const) and re-stream I up to 5x.
        return lax.optimization_barrier(j_einsum(s, I))

    def j_bcast(s, I):
        red = jnp.sum(I, axis=1).astype(jnp.float32)  # (c,P) one raw pass
        return (jnp.broadcast_to(red[:, None, :], (c, 4, P))
                * (1.0 + 1e-30 * jnp.sum(s).astype(jnp.float32)))

    def iteration(c0, prob, dzf, j_fn, stub_consumers):
        z, rho, s, N = c0
        s = srps.estimate_lighting(prob, rho, N, s)
        G = jnp.einsum("nck,ncl->ckl", s, s, precision=HI)
        J = j_fn(s, prob.I)
        if stub_consumers:
            # keep J materialised (cheap full reduction) but feed the
            # consumers a broadcast lookalike so their reads are free
            jsum = jnp.sum(J) * 1e-30
            J = jnp.broadcast_to(
                rho.reshape(c, P)[:, None, :] * (1.0 + jsum), (c, 4, P))
        mom = srps.SMoments(G, J)
        rho = srps.estimate_albedo(prob, mom, N, rho)
        op = srps.build_depth_operator(prob, mom, rho, dzf, lam)
        x, iters, _ = _pvm.cg_pallas_vmem_fromop(
            z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
            tol=0.0, max_iter=100)
        z2 = x * prob.mask
        e = srps.depth_energy(z2, op, prob, sf, lam)
        zx = gradops.grad_x(z2, prob.gm)
        zy = gradops.grad_y(z2, prob.gm)
        N2, _ = normals_from_depth(z2, zx, zy, prob.xx, prob.yy,
                                   prob.mask, prob.fx, prob.fy)
        return (z2 + 1e-20 * e, rho, s, N2)

    def make(j_fn, stub_consumers=False):
        def f(k, c0, prob, dzf):
            return lax.fori_loop(
                0, k,
                lambda i, cc: iteration(cc, prob, dzf, j_fn, stub_consumers),
                c0)[0]
        return jax.jit(f)

    c0 = (st.z, st.rho, st.s, st.N)
    for name, j_fn, stub in (
            ("einsum (prod)", j_einsum, False),
            ("einsum + opt_barrier", j_einsum_bar, False),
            ("einsum, consumers stubbed", j_einsum, True),
            ("unroll-n elementwise", j_unroll, False),
            ("dot_general c-batch", j_dot, False),
            ("broadcast J (floor)", j_bcast, False),
    ):
        f = make(j_fn, stub)
        ms = marginal(lambda k: f(k, c0, prob, st.dz)) * 1e3
        print(f"{name:<28} {ms:8.3f} ms/iter")


if __name__ == "__main__":
    main()
