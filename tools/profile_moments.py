"""In-context cost of the s_moments J pass, by lowering variant.

The glue ablation (tools/profile_glue3.py) charges ~4 ms/outer-iteration
to the moments stage while the raw bytes floor (one 295 MB read of I +
one 59 MB write of J) is ~0.6 ms — this isolates the J computation in
the same chained-loop shape to find where that factor comes from.

Every variant computes the identical (c, 4, P) f32 J and accumulates it
into a loop carry (forcing materialisation, same for all variants).
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


def marginal(f, n_lo=2, n_hi=12, reps=5):
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

    I = prob.I  # (c, n, P) channel-major flat
    c, n_img, P = I.shape
    s0 = st.s  # (n, c, 4)

    # Variants take I as an argument: closing over the 295 MB device
    # array would embed it in the serialized module (CLAUDE.md gotcha).
    def v_einsum(s, I):
        return jnp.einsum("nck,cnp->ckp", s, I, precision=HI,
                          preferred_element_type=jnp.float32)

    def v_dot(s, I):
        # explicit batched (4, n) @ (n, P): batch c
        sT = jnp.transpose(s, (1, 2, 0))  # (c, 4, n) — tiny
        return lax.dot_general(
            sT, I, (((2,), (1,)), ((0,), (0,))), precision=HI,
            preferred_element_type=jnp.float32)

    def v_unroll_n(s, I):
        # 20-term scalar-weighted elementwise sum, fused by XLA into one
        # pass over I per output k-plane
        return sum(s[i][:, :, None] * I[:, i, None, :]
                   for i in range(n_img))

    def v_floor(s, I):
        # bytes floor: one raw pass over I, J-shaped broadcast output
        red = jnp.sum(I, axis=1) * (1e-30 * jnp.sum(s))  # (c, P)
        return jnp.broadcast_to(red[:, None, :], (c, 4, P)) * 1.0

    variants = [
        ("einsum nck,cnp->ckp", v_einsum),
        ("dot_general c-batch", v_dot),
        ("unroll n (20 terms)", v_unroll_n),
        ("floor (raw I pass)", v_floor),
    ]

    Jc0 = jnp.zeros((c, 4, P), jnp.float32)
    for name, fn in variants:
        def loop(n, s0, Jc0, I_):
            def body(i, carry):
                s, Jc = carry
                s = s * 0.999 + 1e-6
                J = fn(s, I_)
                return (s, J + 1e-20 * Jc)
            return lax.fori_loop(0, n, body, (s0, Jc0))[1]

        f = jax.jit(loop)
        ms = marginal(lambda k: f(k, s0, Jc0, I)) * 1e3
        print(f"{name:<24} {ms:8.3f} ms/iter")


if __name__ == "__main__":
    main()
