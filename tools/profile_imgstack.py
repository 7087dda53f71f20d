"""Image-layout image-stack experiment (VERDICT r4 item 9).

The round-4 HLO census charges ~571k cycles/outer-iteration to pure
layout copies: rho -> rf (c,P), N -> Nf (4,P), one more (1,P) plane —
all forced because the image stack I is stored pixel-flat (c, n, h*w)
(deliberate: the big per-iteration dots then never re-retile I), so the
lighting stage must retile its small operands to flat. Plus s_moments
pays ONE (c,4,P) -> (c,4,h,w) retile of J.

Candidate: store I image-shaped (c, n, h, w) and keep EVERYTHING in
image layout:
  - ATA: image-space full reductions (round-4: a measured tie),
  - ATb: 4 unrolled shared-operand reductions sum_hw (rho*N_a) * I_cn
    (the ATA pattern: XLA fuses multi-output reductions over one I pass
    — IF the fusion holds; if it splits into 4 passes over 295 MB this
    loses big, which is why this is measured in context),
  - J: unrolled weighted sums over the static n=20 axis — a pure map,
    one I pass, J lands in image layout directly (no retile at all).

Interleaved same-process chained differencing. Run ALONE:
python tools/profile_imgstack.py
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

from bench import _enable_compile_cache, find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.models.srps import HI, SMoments  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def estimate_lighting_img(prob, rho, N, s_prev=None):
    """prob.I is (c, n, h, w); zero flat retiles anywhere."""
    c, n = prob.I.shape[:2]
    R2 = rho * rho
    ata = {}
    for a in range(4):
        for b in range(a, 4):
            ata[(a, b)] = jnp.sum(R2 * (N[a] * N[b])[None], axis=(1, 2))
    ATA = jnp.stack([
        jnp.stack([ata[(min(a, b), max(a, b))] for b in range(4)], axis=-1)
        for a in range(4)
    ], axis=-2)  # (c,4,4)
    # ATb[c,n,a] = sum_hw (rho_c N_a) I_cn — 4 shared-operand reductions
    # (T_a built inline so the fusion reads rho/N, not a materialised T).
    ATb = jnp.stack(
        [jnp.sum((rho * N[a][None])[:, None] * prob.I, axis=(-2, -1))
         for a in range(4)], axis=-1)  # (c,n,4)
    inv = srps._inv4(ATA)
    sol = jnp.einsum("cab,cnb->nca", inv, ATb, precision=HI)
    if s_prev is None:
        return sol
    ok = jnp.all(jnp.isfinite(sol), axis=-1, keepdims=True)
    return jnp.where(ok, sol, s_prev)


def s_moments_img(prob, s):
    """J as an unrolled weighted sum over the static n axis: one map pass
    over image-layout I, J lands (c,4,h,w) with NO retile."""
    c, n = prob.I.shape[:2]
    G = jnp.einsum("nck,ncl->ckl", s, s, precision=HI)
    J = jnp.stack(
        [sum(s[i, :, k][:, None, None] * prob.I[:, i] for i in range(n))
         for k in range(4)], axis=1)  # (c,4,h,w)
    return SMoments(G=G, J=J.astype(jnp.float32))


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    sf = int(data.sf)
    cfg = SolverConfig(use_pallas=True)
    prob, state0 = prepare(data, cfg)
    h, w = np.asarray(prob.mask).shape
    c, n = prob.I.shape[:2]
    prob_img = prob._replace(I=prob.I.reshape(c, n, h, w))

    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)

    # Parity first (vs an f64 host referee: the two f32 candidates
    # reassociate a cancellative reduction differently, so judge each
    # against the exact answer rather than against each other).
    s_a = jax.jit(srps.estimate_lighting)(prob, st.rho, st.N, st.s)
    s_b = jax.jit(estimate_lighting_img)(prob_img, st.rho, st.N, st.s)
    rel = float(jnp.max(jnp.abs(s_a - s_b)) / (jnp.max(jnp.abs(s_a)) + 1e-30))
    print(f"lighting flat-vs-img max rel diff: {rel:.2e}")
    rho64 = np.asarray(st.rho, np.float64)
    N64 = np.asarray(st.N, np.float64)
    I64 = np.asarray(prob_img.I, np.float64)
    R2 = rho64 * rho64
    ATA64 = np.stack([np.stack(
        [np.sum(R2 * (N64[a] * N64[b])[None], axis=(1, 2))
         for b in range(4)], -1) for a in range(4)], -2)
    ATb64 = np.stack(
        [np.sum((rho64 * N64[a][None])[:, None] * I64, axis=(-2, -1))
         for a in range(4)], -1)
    s64 = np.einsum("cab,cnb->nca", np.linalg.inv(ATA64), ATb64)
    scale = np.abs(s64).max() + 1e-30
    for nm, s_c in (("flat", s_a), ("img", s_b)):
        err = float(np.abs(np.asarray(s_c, np.float64) - s64).max() / scale)
        print(f"  {nm} vs f64: {err:.2e}")
    assert rel < 1e-2, rel
    J_a = jax.jit(srps.s_moments)(prob, s_a).J
    J_b = jax.jit(s_moments_img)(prob_img, s_a).J
    relJ = float(jnp.max(jnp.abs(J_a - J_b)) / (jnp.max(jnp.abs(J_a)) + 1e-30))
    print(f"J max rel diff: {relJ:.2e}")
    assert relJ < 1e-5, relJ

    def outer_loop(n_it, carry, e, c_):
        def body(i, cr):
            z, rho, s, N, dz = cr
            st2 = srps.srps_iteration(
                e["st"]._replace(z=z, rho=rho, s=s, N=N, dz=dz), e["prob"],
                sf, c_)
            return (st2.z, st2.rho, st2.s, st2.N, st2.dz)

        return lax.fori_loop(0, n_it, body, carry)

    carry = (st.z, st.rho, st.s, st.N, st.dz)
    orig_l, orig_m = srps.estimate_lighting, srps.s_moments
    fns = {}
    for name, (fl, fm, pb) in (
            ("flat", (orig_l, orig_m, prob)),
            ("img", (estimate_lighting_img, s_moments_img, prob_img))):
        srps.estimate_lighting, srps.s_moments = fl, fm
        f = jax.jit(lambda n_it, cr, e, c_: outer_loop(n_it, cr, e, c_),
                    static_argnums=(0, 3))
        env = dict(prob=pb, st=st)
        for n_it in (2, 12):
            np.asarray(jnp.sum(f(n_it, carry, env, cfg)[0]))
        fns[name] = (f, env)
    srps.estimate_lighting, srps.s_moments = orig_l, orig_m

    n_lo, n_hi, reps = 2, 12, 6
    best = {(k, n_): 1e9 for k in fns for n_ in (n_lo, n_hi)}
    for rep in range(reps):
        order = list(fns.items())
        if rep % 2:
            order.reverse()
        for name, (f, env) in order:
            for n_ in (n_lo, n_hi):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(f(n_, carry, env, cfg)[0]))
                best[(name, n_)] = min(best[(name, n_)],
                                       time.perf_counter() - t0)
    for name in fns:
        ms = (best[(name, n_hi)] - best[(name, n_lo)]) / (n_hi - n_lo) * 1e3
        print(f"{name:5s} ms/outer-iter = {ms:7.3f}  "
              f"(lo={best[(name, n_lo)]:.4f}s hi={best[(name, n_hi)]:.4f}s)")


if __name__ == "__main__":
    main()
