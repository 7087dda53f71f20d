"""Lighting-stage layout experiment 2 (round 5): FULL image-space lighting.

Round 4 measured image-space ATA with a flat ATb as a tie — the ATb dot
forced the rho/N retiles regardless (tools/profile_lightlayout.py). This
candidate removes the flat forms entirely: ATA as image-space full
reductions AND ATb as a dot_general contracting BOTH trailing image dims
("cahw,cnhw->cna" — (h, w) are contracted, not free, so the round-2
"transpose-heavy einsum" trap does not apply if XLA merges the adjacent
minor dims in place). If the 571k-cycle layout copies
(tools/dump_hlo_kenergy.py) disappear without a slower dot lowering, this
is the ms_per_outer_iter <= 3.2 lever (VERDICT r4 item 9).

Interleaved same-process chained differencing; asserts near-identical
lighting solutions first. Run ALONE: python tools/profile_lightimg.py
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
from srmeetsps_cuda_tpu.models.srps import HI  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def estimate_lighting_fullimg(prob, rho, N, s_prev=None):
    """Zero flat retiles: ATA via image-space reductions, ATb via a
    dot_general contracting (h, w) on the carried image layouts."""
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
    T = rho[:, None] * N[None]  # (c,4,h,w)
    ATb = jnp.einsum("cahw,cnhw->cna", T, prob.I, precision=HI,
                     preferred_element_type=jnp.float32)  # (c,n,4)
    inv = srps._inv4(ATA)
    sol = jnp.einsum("cab,cnb->nca", inv, ATb, precision=HI)
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

    s_a = jax.jit(orig)(prob, st.rho, st.N, st.s)
    s_b = jax.jit(estimate_lighting_fullimg)(prob, st.rho, st.N, st.s)
    rel = float(jnp.max(jnp.abs(s_a - s_b)) / (jnp.max(jnp.abs(s_a)) + 1e-30))
    print(f"lighting solution max rel diff: {rel:.2e}")
    assert rel < 1e-5, rel

    fns = {}
    for name, impl in (("flat", orig), ("img", estimate_lighting_fullimg)):
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
        ms = (best[(name, n_hi)] - best[(name, n_lo)]) / (n_hi - n_lo) * 1e3
        print(f"{name:5s} ms/outer-iter = {ms:7.3f}  "
              f"(lo={best[(name, n_lo)]:.4f}s hi={best[(name, n_hi)]:.4f}s)")


if __name__ == "__main__":
    main()
