"""In-kernel energy epilogue vs the XLA energy pass, interleaved.

Measures the full fused solve (chained outer iterations, dispatch-free
differencing) with cfg.kernel_energy on/off in the SAME process,
alternating reps (CLAUDE.md: the chip's effective rate drifts tens of
percent over minutes — only interleaved comparisons distinguish
candidates, and use difference-of-bests across reps).

Also asserts the two variants' final energies agree (the epilogue
evaluates the same quantity up to f32 reassociation) and that the
in-kernel CG iteration counts are unchanged (no predicated-skip
misattribution, see tools/profile_glue4.py).
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


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    sf = int(data.sf)
    # --null: both slots run the OFF config — calibrates fixed-order bias
    # in the rep loop (the chip rate drifts; if the first-timed slot
    # systematically loses, deltas of this harness are ordering artifacts
    # at that magnitude, not feature costs).
    null = "--null" in sys.argv
    cfg_on = SolverConfig(use_pallas=True, kernel_energy=not null)
    cfg_off = SolverConfig(use_pallas=True, kernel_energy=False)
    prob, state0 = prepare(data, cfg_on)

    def outer_loop(n, carry, e, c):
        def body(i, cr):
            z, rho, s, N, dz, en = cr
            st2 = srps.srps_iteration(
                e["st"]._replace(z=z, rho=rho, s=s, N=N, dz=dz), e["prob"],
                sf, c)
            return (st2.z, st2.rho, st2.s, st2.N, st2.dz, en + st2.energy)

        return lax.fori_loop(0, n, body, carry)

    f_outer = jax.jit(outer_loop, static_argnums=(0, 3))
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg_on)
    np.asarray(st.z)
    env = dict(prob=prob, st=st)
    carry = (st.z, st.rho, st.s, st.N, st.dz, jnp.float32(0.0))

    # energy parity check first (full solve)
    from srmeetsps_cuda_tpu.runtime.solver import _jit_solve_fused

    f_on, _ = _jit_solve_fused(state0, prob, sf, cfg_on)
    f_off, _ = _jit_solve_fused(state0, prob, sf, cfg_off)
    e_on, e_off = float(f_on.energy), float(f_off.energy)
    print(f"final energy on={e_on:.4f} off={e_off:.4f} "
          f"rel={abs(e_on - e_off) / abs(e_off):.2e} "
          f"iters on={int(f_on.iteration)} off={int(f_off.iteration)} "
          f"cg on={int(f_on.cg_iters)} off={int(f_off.cg_iters)}")

    # warm both chains
    n_lo, n_hi, reps = 2, 12, 6
    for c in (cfg_on, cfg_off):
        for n in (n_lo, n_hi):
            np.asarray(jnp.sum(f_outer(n, carry, env, c)[0]))
    best = {("on", n_lo): 1e9, ("on", n_hi): 1e9,
            ("off", n_lo): 1e9, ("off", n_hi): 1e9}
    for rep in range(reps):
        # alternate slot order per rep: a fixed order couples the chip's
        # minutes-scale rate drift to the slot, biasing the delta
        pairs = [("on", cfg_on), ("off", cfg_off)]
        if rep % 2:
            pairs.reverse()
        for name, c in pairs:
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(f_outer(n, carry, env, c)[0]))
                dt = time.perf_counter() - t0
                best[(name, n)] = min(best[(name, n)], dt)
    for name in ("on", "off"):
        per = (best[(name, n_hi)] - best[(name, n_lo)]) / (n_hi - n_lo)
        print(f"kernel_energy={name:<3} {per * 1e3:8.3f} ms/outer-iter")
    d_on = best[("on", n_hi)] - best[("on", n_lo)]
    d_off = best[("off", n_hi)] - best[("off", n_lo)]
    print(f"delta {(d_off - d_on) / (n_hi - n_lo) * 1e3:+.3f} ms/outer-iter "
          f"(positive = epilogue wins)")


if __name__ == "__main__":
    main()
