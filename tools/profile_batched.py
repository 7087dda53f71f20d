"""Where does the batched path lose vs the single-problem iteration?

BENCH_r03: batched B=4 = 24.1 problems/s vs 37/s sustained single — a
~1.5x per-problem regression. The CG kernel is the same stencil-resident
one (lanes sequential over the launch grid), so the suspects are the
vmapped glue stages (lighting/moments/albedo einsums whose layouts were
tuned single-problem) and the vmapped XLA energy pass.

Interleaved chained differencing (CLAUDE.md methodology): slots are
  single : srps.srps_iteration, one problem
  b1     : batched._iteration_batched_pallas at B=1
  b4     : batched._iteration_batched_pallas at B=4 (report /4 per-lane)
Alternating slot order per rep; difference-of-bests across reps.
"""

from __future__ import annotations

import itertools
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
from srmeetsps_cuda_tpu.parallel import batched  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


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

    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)

    def chain_single(n, carry, e, c):
        def body(i, cr):
            z, rho, s, N, dz = cr
            st2 = srps.srps_iteration(
                e["st"]._replace(z=z, rho=rho, s=s, N=N, dz=dz),
                e["prob"], sf, c)
            return (st2.z, st2.rho, st2.s, st2.N, st2.dz)

        return lax.fori_loop(0, n, body, carry)

    def chain_batched(n, carry, e, c):
        def body(i, cr):
            z, rho, s, N, dz = cr
            st2 = batched._iteration_batched_pallas(
                e["st"]._replace(z=z, rho=rho, s=s, N=N, dz=dz),
                e["prob"], sf, c)
            return (st2.z, st2.rho, st2.s, st2.N, st2.dz)

        return lax.fori_loop(0, n, body, carry)

    f_single = jax.jit(chain_single, static_argnums=(0, 3))
    f_batched = jax.jit(chain_batched, static_argnums=(0, 3))

    slots = {}
    env1 = dict(prob=prob, st=st)
    carry1 = (st.z, st.rho, st.s, st.N, st.dz)
    slots["single"] = (f_single, carry1, env1, 1)
    for B in (1, 4):
        pb = batched.stack_problems([prob] * B)
        sb = batched.stack_states([st] * B)
        envB = dict(prob=pb, st=sb)
        carryB = (sb.z, sb.rho, sb.s, sb.N, sb.dz)
        slots[f"b{B}"] = (f_batched, carryB, envB, B)

    n_lo, n_hi, reps = 2, 10, 6
    for name, (f, carry, env, B) in slots.items():
        for n in (n_lo, n_hi):
            np.asarray(jnp.sum(f(n, carry, env, cfg)[0]))
        print(f"warmed {name}")
    best = {(name, n): 1e9 for name in slots for n in (n_lo, n_hi)}
    order = list(slots.items())
    for rep in range(reps):
        for name, (f, carry, env, B) in (
                order if rep % 2 == 0 else order[::-1]):
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(f(n, carry, env, cfg)[0]))
                best[(name, n)] = min(best[(name, n)],
                                      time.perf_counter() - t0)
    for name, (_, _, _, B) in slots.items():
        per = (best[(name, n_hi)] - best[(name, n_lo)]) / (n_hi - n_lo)
        print(f"{name:<6} {per * 1e3:8.3f} ms/outer-iter"
              f"  ({per / B * 1e3:7.3f} ms/lane-iter)")


if __name__ == "__main__":
    main()
