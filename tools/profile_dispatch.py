"""Single-solve dispatch-gap anatomy (VERDICT r4 item 7).

The one-shot Mitten SF=2 solve walls ~0.045 s while the device spends
~0.024 s — the remaining ~20 ms is axon-tunnel round-trip cost. This
harness times the candidate one-shot protocols interleaved (drift-proof):

  a) status-quo: dispatch solve, dispatch jnp.sum(z), fetch the sum
     (what bench.py + Timer.end pay today)
  b) scalar-out: dispatch solve, fetch final.energy directly (no second
     program dispatch — the energy is already an output of the solve)
  c) row-slice: dispatch solve, fetch z[:1, :1] (Timer.end's protocol)
  d) pre-dispatched warm shadow: dispatch a same-shape solve FIRST (not
     fetched), then the timed solve — measures whether the tunnel
     pipelines back-to-back program launches

Run ALONE on the chip: python tools/profile_dispatch.py
"""

from __future__ import annotations

import json
import sys
import time

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import _enable_compile_cache, find_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import (_jit_solve_fused,  # noqa: E402
                                               prepare)


def main():
    _enable_compile_cache()
    from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

    data = load_image_dataset(find_dataset())
    sf = int(data.sf)
    cfg = SolverConfig(use_pallas=True)
    prob, st0 = prepare(data, cfg)

    final, _ = _jit_solve_fused(st0, prob, sf, cfg)
    float(np.asarray(jnp.sum(final.z)))  # compile + warm

    sum_z = jax.jit(lambda z: jnp.sum(z))
    float(np.asarray(sum_z(final.z)))  # warm the sum program

    def proto_a():
        f, _ = _jit_solve_fused(st0, prob, sf, cfg)
        return float(np.asarray(jnp.sum(f.z)))

    def proto_b():
        f, _ = _jit_solve_fused(st0, prob, sf, cfg)
        return float(np.asarray(f.energy))

    def proto_c():
        f, _ = _jit_solve_fused(st0, prob, sf, cfg)
        return float(np.asarray(f.z[:1, :1]))

    def proto_d():
        _jit_solve_fused(st0, prob, sf, cfg)  # shadow, never fetched
        f, _ = _jit_solve_fused(st0, prob, sf, cfg)
        return float(np.asarray(f.energy))

    protos = {"a_sum_fetch": proto_a, "b_energy_fetch": proto_b,
              "c_slice_fetch": proto_c, "d_shadowed": proto_d}
    best = {k: 1e9 for k in protos}
    times = {k: [] for k in protos}
    for rep in range(8):
        for k, fn in protos.items():
            fn()  # absorb any re-warm effects
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            times[k].append(dt)
            best[k] = min(best[k], dt)
    out = {f"{k}_best_s": round(v, 4) for k, v in best.items()}
    out.update({f"{k}_med_s": round(float(np.median(times[k])), 4)
                for k in protos})
    # d measures two solves; halve for the marginal.
    out["d_marginal_s"] = round(best["d_shadowed"] / 2, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
