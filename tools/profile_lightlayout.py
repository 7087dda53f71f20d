"""Lighting-stage layout experiment: flat-pixel vs image-space ATA.

The round-4 while-body HLO census (tools/dump_hlo_kenergy.py) shows the
lighting stage's flat-form retiles cost ~571k cycles/outer-iteration of
pure layout copies (rho -> rf: copy f32[1,3,960,1280] {3,1,2,0:T(4,128)}
216k cycles; N -> Nf: copy f32[1,4,960,1280] 139k; one more plane 216k).
Candidate: compute the ten ATA reductions directly on the carried
(c,h,w)/(4,h,w) image layouts (full reductions have no (h,w) free dims,
so the round-2 "transpose-heavy einsum" trap does not apply) and keep
ONLY the ATb dot on the flat forms — the retile then has a single
consumer and can fuse into the T-materialisation pass.

Interleaved same-process chained differencing per the project
methodology; asserts identical lighting solutions first.
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
from srmeetsps_cuda_tpu.models.srps import HI  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def estimate_lighting_imgspace(prob, rho, N, s_prev=None):
    """ATA via image-space full reductions; ATb dot unchanged."""
    h, w = prob.mask.shape
    c, n = prob.I.shape[:2]
    R2 = rho * rho  # (c,h,w)
    ata = {}
    for a in range(4):
        for b in range(a, 4):
            ata[(a, b)] = jnp.sum(R2 * (N[a] * N[b])[None, :, :],
                                  axis=(1, 2))
    ATA = jnp.stack([
        jnp.stack([ata[(min(a, b), max(a, b))] for b in range(4)], axis=-1)
        for a in range(4)
    ], axis=-2)  # (c,4,4)
    rf = rho.reshape(c, h * w)
    Nf = N.reshape(4, h * w)
    T = rf[:, None] * Nf[None, :]  # (c,4,P)
    ATb = jnp.einsum("cap,cnp->nca", T, prob.I, precision=HI,
                     preferred_element_type=jnp.float32)
    inv = srps._inv4(ATA)
    sol = jnp.einsum("cab,ncb->nca", inv, ATb, precision=HI)
    if s_prev is None:
        return sol
    ok = jnp.all(jnp.isfinite(sol), axis=-1, keepdims=True)
    return jnp.where(ok, sol, s_prev)


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

    orig = srps.estimate_lighting

    def outer_loop(n, carry, e, c):
        def body(i, cr):
            z, rho, s, N, dz = cr
            st2 = srps.srps_iteration(
                e["st"]._replace(z=z, rho=rho, s=s, N=N, dz=dz), e["prob"],
                sf, c)
            return (st2.z, st2.rho, st2.s, st2.N, st2.dz)

        return lax.fori_loop(0, n, body, carry)

    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)
    env = dict(prob=prob, st=st)
    carry = (st.z, st.rho, st.s, st.N, st.dz)

    # parity: one lighting call each way
    s_a = jax.jit(orig)(prob, st.rho, st.N, st.s)
    srps.estimate_lighting = estimate_lighting_imgspace
    s_b = jax.jit(estimate_lighting_imgspace)(prob, st.rho, st.N, st.s)
    srps.estimate_lighting = orig
    rel = float(jnp.max(jnp.abs(s_a - s_b)) / (jnp.max(jnp.abs(s_a)) + 1e-30))
    print(f"lighting solution max rel diff: {rel:.2e}")

    # build both chained programs (trace under the right implementation)
    fns = {}
    for name, impl in (("flat", orig), ("img", estimate_lighting_imgspace)):
        srps.estimate_lighting = impl
        f = jax.jit(lambda n, cr, e, c: outer_loop(n, cr, e, c),
                    static_argnums=(0, 3))
        for n in (2, 12):
            np.asarray(jnp.sum(f(n, carry, env, cfg)[0]))
        fns[name] = f
    srps.estimate_lighting = orig

    n_lo, n_hi, reps = 2, 12, 6
    best = {(k, n): 1e9 for k in fns for n in (n_lo, n_hi)}
    for rep in range(reps):
        order = list(fns.items())
        if rep % 2:
            order.reverse()
        for name, f in order:
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(f(n, carry, env, cfg)[0]))
                best[(name, n)] = min(best[(name, n)],
                                      time.perf_counter() - t0)
    for name in fns:
        per = (best[(name, n_hi)] - best[(name, n_lo)]) / (n_hi - n_lo)
        print(f"lighting={name:<5} {per * 1e3:8.3f} ms/outer-iter")
    d = ((best[("flat", n_hi)] - best[("flat", n_lo)])
         - (best[("img", n_hi)] - best[("img", n_lo)])) / (n_hi - n_lo)
    print(f"delta {d * 1e3:+.3f} ms/outer-iter (positive = img-space wins)")


if __name__ == "__main__":
    main()
