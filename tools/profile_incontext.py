"""In-context CG rate: marginal outer-iteration time vs cg_max_iter.

outer(cap_b) - outer(cap_a) isolates the per-CG-step cost INSIDE the real
solve; comparing cap ranges detects any per-launch transient.
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

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def marginal(f, n_lo=2, n_hi=12, reps=4):
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
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    sf = int(data.sf)
    caps = [int(a) for a in sys.argv[1:]] or [1, 25, 50, 100, 200]
    cfg0 = SolverConfig(use_pallas=True)
    prob, state0 = prepare(data, cfg0)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg0)
    np.asarray(st.z)

    def outer_loop(n, carry, e, c):
        def body(i, cr):
            z, rho, s = cr
            st2 = srps.srps_iteration(
                e["st"]._replace(z=z, rho=rho, s=s), e["prob"], sf, c)
            return (st2.z, st2.rho, st2.s)
        return lax.fori_loop(0, n, body, carry)[0]

    f_outer = jax.jit(outer_loop, static_argnums=(0, 3))
    env = dict(prob=prob, st=st)
    carry = (st.z, st.rho, st.s)
    res = {}
    for cap in caps:
        cfg = SolverConfig(use_pallas=True, cg_max_iter=cap)
        # cg_tol tiny so every step is active (like the production cap).
        ms = marginal(lambda n: f_outer(n, carry, env, cfg)) * 1e3
        res[cap] = ms
        print(f"outer(cap={cap:<4}) {ms:8.3f} ms/iter")
    ks = sorted(res)
    for a, b in zip(ks, ks[1:]):
        per = (res[b] - res[a]) / (b - a) * 1e3
        print(f"in-context rate {a:>4}->{b:<4} {per:8.1f} us/cg-iter")


if __name__ == "__main__":
    main()
