"""In-context test of J CONSUMER layouts.

tools/profile_mctx.py showed the ~3.5 ms moments-stage cost sits in the
consumers' reads of the flat (c, 4, P) J (row slices are sublane-strided
on TPU), not in the producing einsum (roofline) and not in fusion
re-computation (opt_barrier changes nothing). This measures the full
iteration with the consumers fed J in different physical layouts:

  flat (prod)     — consumers read J[i, k] rows of the (c,4,P) array
  hw relayout     — ONE reshape to (c,4,h,w) (the round-2 layout),
                    albedo/B_k/const consume contiguous (h,w) planes
  row split       — four barrier'd (c,P) arrays J0..J3

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
    fx, fy, xx, yy = prob.fx, prob.fy, prob.xx, prob.yy

    def albedo_hw(prob, Jhw, G, N, rho_prev):
        cN = Jhw.shape[0]
        num = jnp.stack([
            sum(N[k] * Jhw[i, k] for k in range(4)) for i in range(cN)])
        NN = {(k, l): N[k] * N[l] for k in range(4) for l in range(k, 4)}
        den = jnp.stack([
            sum((1.0 if k == l else 2.0) * G[i, k, l] * NN[(k, l)]
                for k in range(4) for l in range(k, 4))
            for i in range(cN)])
        rho = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                        rho_prev)
        return rho * prob.mask

    def opbuild_hw(prob, Jhw, G, rho, dz):
        w1 = rho / dz
        w2 = w1 * w1
        w1r = w1 * rho
        cN = w1.shape[0]
        A00 = sum(w2[i] * G[i, 0, 0] for i in range(cN))
        A01 = sum(w2[i] * G[i, 0, 1] for i in range(cN))
        A02 = sum(w2[i] * G[i, 0, 2] for i in range(cN))
        A11 = sum(w2[i] * G[i, 1, 1] for i in range(cN))
        A12 = sum(w2[i] * G[i, 1, 2] for i in range(cN))
        A22 = sum(w2[i] * G[i, 2, 2] for i in range(cN))
        D03 = sum(w1r[i] * G[i, 0, 3] for i in range(cN))
        D13 = sum(w1r[i] * G[i, 1, 3] for i in range(cN))
        D23 = sum(w1r[i] * G[i, 2, 3] for i in range(cN))
        B0 = sum(w1[i] * Jhw[i, 0] for i in range(cN))
        B1 = sum(w1[i] * Jhw[i, 1] for i in range(cN))
        B2 = sum(w1[i] * Jhw[i, 2] for i in range(cN))
        P11 = fx * fx * A00 - 2.0 * fx * xx * A02 + xx * xx * A22
        P22 = fy * fy * A11 - 2.0 * fy * yy * A12 + yy * yy * A22
        P33 = A22
        P12 = fx * fy * A01 - fx * yy * A02 - fy * xx * A12 + xx * yy * A22
        P13 = fx * A02 - xx * A22
        P23 = fy * A12 - yy * A22
        QB3 = B2 - D23
        QB1 = fx * (B0 - D03) - xx * QB3
        QB2 = fy * (B1 - D13) - yy * QB3
        const = (jnp.sum(prob.SI2)
                 - 2.0 * jnp.sum(rho * Jhw[:, 3])
                 + jnp.vdot(jnp.sum((rho * rho).reshape(cN, P), axis=1),
                            G[:, 3, 3]))
        return srps.DepthOperator(P11, P12, P13, P22, P23, P33,
                                  QB1, QB2, QB3, const)

    def iteration(c0, prob, dzf, mode):
        z, rho, s, N = c0
        s = srps.estimate_lighting(prob, rho, N, s)
        G = jnp.einsum("nck,ncl->ckl", s, s, precision=HI)
        Jf = jnp.einsum("nck,cnp->ckp", s.astype(prob.I.dtype), prob.I,
                        precision=HI, preferred_element_type=jnp.float32)
        if mode == "flat":
            mom = srps.SMoments(G, Jf)
            rho = srps.estimate_albedo(prob, mom, N, rho)
            op = srps.build_depth_operator(prob, mom, rho, dzf, lam)
        elif mode == "hw":
            Jhw = lax.optimization_barrier(Jf.reshape(c, 4, h, w))
            rho = albedo_hw(prob, Jhw, G, N, rho)
            op = opbuild_hw(prob, Jhw, G, rho, dzf)
        elif mode == "rows":
            J0, J1, J2, J3 = lax.optimization_barrier(
                tuple(Jf[:, k] for k in range(4)))
            Jr = jnp.stack([J0, J1, J2, J3], axis=1)
            mom = srps.SMoments(G, Jr)
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

    def make(mode):
        def f(k, c0, prob, dzf):
            return lax.fori_loop(
                0, k, lambda i, cc: iteration(cc, prob, dzf, mode), c0)[0]
        return jax.jit(f)

    c0 = (st.z, st.rho, st.s, st.N)
    for mode in ("flat", "hw", "rows"):
        f = make(mode)
        ms = marginal(lambda k: f(k, c0, prob, st.dz)) * 1e3
        print(f"{mode:<8} {ms:8.3f} ms/iter")


if __name__ == "__main__":
    main()
