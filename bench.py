"""Benchmark harness: end-to-end SRPS solve on the Mitten fixture, SF=2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numeric benchmark values (BASELINE.md), so
the baseline is self-measured: BASELINE_SECONDS below is the round-1
measurement of this framework's own fused solve on a single TPU v5e chip;
vs_baseline = BASELINE_SECONDS / measured (>1 = faster than round 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Round-1 self-measured fused-solve wall time (s) on one TPU v5e chip,
# Mitten 1280x960, 20 images, SF=2, reference solver constants
# (pure-jnp CG path, before the fused Pallas kernels).
BASELINE_SECONDS = 1.22

MITTEN = "/root/reference/dataset/Images/Mitten"

_T0 = time.time()


def _note(msg: str):
    """Progress/wall-clock note on stderr (stdout stays the one JSON
    line). The driver and humans can see where a long run is spending
    its budget (local Mosaic lowering of each distinct program is the
    usual answer)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the fused-solve program compiles
    remotely through the TPU tunnel (minutes); caching makes repeat bench
    runs (and the driver's end-of-round run) start in seconds."""
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_srmeetsps"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def find_dataset():
    if os.path.isdir(MITTEN):
        return MITTEN
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dataset", "Mitten")
    if os.path.isdir(here):
        return here
    return None


def synthetic_dataset(h=960, w=1280, sf=2, n=20, c=3):
    """Fallback workload with the Mitten geometry when the fixture is
    unavailable."""
    import numpy as np

    from srmeetsps_cuda_tpu.io.image_loader import ProblemData

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (0.4 * min(h, w)) ** 2
            ).astype(np.float32)
    I = rng.random((n, c, h, w)).astype(np.float32)
    z0 = (rng.random((n, h // sf, w // sf)).astype(np.float32) + 1.0) * 4000.0
    K = np.array([[1216.73, 0, w / 2 - 0.5], [0, 1216.73, h / 2 - 0.5],
                  [0, 0, 1]], np.float32)
    return ProblemData(I=I, K=K, mask=mask, sf=sf, z0=z0)


def _load_mitten():
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        return load_image_dataset(ds), ds
    return synthetic_dataset(), None


def batched_metrics(B: int = 4, image_dtype: str = "float32", data=None):
    """BASELINE config 4: batched multi-object throughput. Measures BOTH
    execution forms with the sustained (async back-to-back, force-last)
    methodology so they are comparable to `sustained_solves_per_sec`:

    * streaming (the single-chip default route, parallel/batched.py::
      solve_batch "auto") — B async dispatches of the resident fused
      solve per batch; matches single-stream sustained by construction.
    * lockstep — the lane-batched Pallas launch; lanes run sequentially
      over the kernel grid on one TensorCore, so its vmapped-glue
      overhead makes it SLOWER here (r4: 28.9 vs 41.2 solves/s). It is
      kept for single-dispatch latency and the multi-chip DP form.

    Subcommand `python bench.py batched [B]`; bf16 images (halved
    image-pass HBM traffic) via `python bench.py batched-bf16`."""
    import jax.numpy as jnp
    import numpy as np

    from srmeetsps_cuda_tpu.config import SolverConfig
    from srmeetsps_cuda_tpu.parallel import batched
    from srmeetsps_cuda_tpu.runtime.solver import prepare

    if data is None:
        data, _ = _load_mitten()
    cfg = SolverConfig(use_pallas=True, image_dtype=image_dtype)
    prob, st = prepare(data, cfg)
    probs_l, states_l = [prob] * B, [st] * B
    prob_b = batched.stack_problems(probs_l)
    st_b = batched.stack_states(states_l)
    sf = int(data.sf)

    def sustained(run, force, rounds=2, reps=3):
        """reps x (rounds back-to-back batch solves, force only ONE final
        scalar — the device runs programs in dispatch order, so the last
        lane's completion implies the rest) -> best seconds per batch."""
        force(run())  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(rounds):
                f = run()
            force(f)
            best = min(best, (time.perf_counter() - t0) / rounds)
        return best

    def run_stream():
        finals, _ = batched.solve_batched_streaming(states_l, probs_l, sf,
                                                    cfg)
        return finals[-1]

    def run_lockstep():
        final, _ = batched.solve_batched(st_b, prob_b, sf, cfg)
        return final

    force_e = lambda f: float(np.asarray(f.energy))
    force_z = lambda f: float(np.asarray(jnp.sum(f.z)))
    dt = sustained(run_stream, force_e)
    dt_lk = sustained(run_lockstep, force_z)
    finals, _ = batched.solve_batched_streaming(states_l, probs_l, sf, cfg)
    iters = [int(np.asarray(f.iteration)) for f in finals]
    sfx = "_bf16" if image_dtype == "bfloat16" else ""
    return {
        f"batched{B}{sfx}_solves_per_sec": round(B / dt, 4),
        f"batched{B}{sfx}_seconds_per_batch": round(dt, 4),
        f"batched{B}{sfx}_iterations": iters,
        f"batched{B}{sfx}_lockstep_solves_per_sec": round(B / dt_lk, 4),
    }


def bench_batched(B: int = 4, image_dtype: str = "float32"):
    print(json.dumps(batched_metrics(B, image_dtype)))


def _fused_best(data, cfg, runs=3):
    """Best-of-N fused-solve wall time. Returns (dt_best, final_state)."""
    import jax.numpy as jnp
    import numpy as np

    from srmeetsps_cuda_tpu.runtime.solver import prepare, _jit_solve_fused

    sf = int(data.sf)
    prob, st = prepare(data, cfg)
    final, trace = _jit_solve_fused(st, prob, sf, cfg)
    float(np.asarray(jnp.sum(final.z)))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        final, trace = _jit_solve_fused(st, prob, sf, cfg)
        float(np.asarray(jnp.sum(final.z)))
        times.append(time.perf_counter() - t0)
    return min(times), final


def _sustained(data, cfg, n=8):
    """Sustained rate: n back-to-back solves, only the LAST forced to the
    host — async dispatch overlaps the per-call tunnel latency with device
    work, cancelling the ~20 ms/call jitter a single-solve wall time
    carries. The honest device-throughput methodology (CLAUDE.md)."""
    import jax.numpy as jnp
    import numpy as np

    from srmeetsps_cuda_tpu.runtime.solver import prepare, _jit_solve_fused

    sf = int(data.sf)
    prob, st = prepare(data, cfg)
    final, _ = _jit_solve_fused(st, prob, sf, cfg)
    float(np.asarray(jnp.sum(final.z)))  # compile + warm
    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last, _ = _jit_solve_fused(st, prob, sf, cfg)
    float(np.asarray(jnp.sum(last.z)))
    return (time.perf_counter() - t0) / n, last


def _timed_solve(data, cfg, metric):
    """Shared fused-solve timing + one-line JSON output (subcommands)."""
    dt, final = _fused_best(data, cfg)
    print(json.dumps({
        "metric": metric,
        "value": round(1.0 / dt, 4),
        "unit": "solves/sec",
        "vs_baseline": round(BASELINE_SECONDS / dt, 3),
        "seconds_per_solve": round(dt, 4),
        "iterations": int(final.iteration),
        "final_energy": float(final.energy),
    }))


def _crop_data(data, h, w):
    import numpy as np

    from srmeetsps_cuda_tpu.io.image_loader import ProblemData

    sf = int(data.sf)
    return ProblemData(
        I=np.asarray(data.I)[:, :, :h, :w], K=data.K,
        mask=np.asarray(data.mask)[:h, :w], sf=data.sf,
        z0=np.asarray(data.z0)[:, :h // sf, :w // sf])


def bench_batched_mixed(B: int = 4):
    """Mixed-geometry batched serving (VERDICT r2 item 2): B objects with
    DIFFERENT grid sizes pad to a common grid (post-preprocess, outside
    their masks) and solve as one lane-batched launch. Invoke with
    `python bench.py batched-mixed [B]`."""
    import jax.numpy as jnp
    import numpy as np

    from srmeetsps_cuda_tpu.config import SolverConfig
    from srmeetsps_cuda_tpu.parallel import batched
    from srmeetsps_cuda_tpu.runtime.solver import prepare

    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        base = load_image_dataset(ds)
    else:
        base = synthetic_dataset()
    sizes = [(960, 1280), (912, 1216), (896, 1152), (864, 1088)]
    datas = [_crop_data(base, *sizes[b % len(sizes)]) for b in range(B)]
    H = max(h for h, _ in sizes[:B])
    W = max(w for _, w in sizes[:B])
    cfg = SolverConfig(use_pallas=True)
    pairs = [prepare(d, cfg, pad_to=(H, W)) for d in datas]
    prob_b = batched.stack_problems([p for p, _ in pairs])
    st_b = batched.stack_states([s for _, s in pairs])
    sf = int(base.sf)
    final, trace = batched.solve_batched(st_b, prob_b, sf, cfg)
    float(np.asarray(jnp.sum(final.z)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        final, trace = batched.solve_batched(st_b, prob_b, sf, cfg)
        float(np.asarray(jnp.sum(final.z)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "metric": f"mitten_sf2_batched{B}_mixed_geometry",
        "value": round(B / dt, 4),
        "unit": "solves/sec",
        "vs_baseline": round(BASELINE_SECONDS / (dt / B), 3),
        "seconds_per_batch": round(dt, 4),
        "sizes": sizes[:B],
        "iterations": np.asarray(final.iteration).tolist(),
    }))


def _sf4_data(base=None):
    from srmeetsps_cuda_tpu.io.image_loader import ProblemData

    if base is None:
        base, _ = _load_mitten()
    if base.z0.shape[1] * 4 == base.mask.shape[0]:
        return ProblemData(I=base.I, K=base.K, mask=base.mask, sf=4,
                           z0=base.z0)
    return ProblemData(I=base.I, K=base.K, mask=base.mask, sf=4,
                       z0=base.z0[:, ::2, ::2])


def sf4_metrics(data=None):
    """BASELINE config 3: SF=4 upscaling (Mitten depth further decimated)."""
    from srmeetsps_cuda_tpu.config import SolverConfig

    dt, final = _fused_best(_sf4_data(data), SolverConfig(use_pallas=True))
    return {
        "sf4_solves_per_sec": round(1.0 / dt, 4),
        "sf4_seconds_per_solve": round(dt, 4),
        "sf4_iterations": int(final.iteration),
        "sf4_final_energy": float(final.energy),
    }


def bench_sf4():
    print(json.dumps(sf4_metrics()))


def metrics_1080p():
    """BASELINE config 5's problem size on ONE chip (the multi-chip
    sharded path is exercised by tests + the driver dryrun + the 1-device
    hardware-mesh test in tests/test_tpu_hw.py; no multi-chip hardware
    here)."""
    from srmeetsps_cuda_tpu.config import SolverConfig
    from srmeetsps_cuda_tpu.runtime.solver import prepare

    data = synthetic_dataset(h=1088, w=1920, sf=2, n=12)
    cfg = SolverConfig(use_pallas=True)
    dt, final = _fused_best(data, cfg)
    out = {
        "1080p_solves_per_sec": round(1.0 / dt, 4),
        "1080p_seconds_per_solve": round(dt, 4),
        "1080p_iterations": int(final.iteration),
    }
    # Per-iteration device metrics (VERDICT r4 item 8): the wall number
    # above comes off a 2-iteration synthetic fixture, so cross-round
    # 1080p progress needs the dispatch-free per-iteration costs too.
    try:
        import numpy as np

        from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg

        prob, state0 = prepare(data, cfg)
        h, w = np.asarray(prob.mask).shape
        if _pcg.supported(h, w, int(data.sf), pipelined=True):
            out.update(device_metrics(prob, state0, int(data.sf), cfg,
                                      prefix="1080p_", light=True))
    except Exception as e:  # pragma: no cover - defensive
        out["1080p_device_metrics_error"] = str(e)[:200]
    return out


def bench_1080p():
    print(json.dumps(metrics_1080p()))


def matpath_metrics(data=None, headline_energy=None):
    """BASELINE config 2: the MATLAB-container input path. The reference's
    mitten_sf2.mat blob is missing upstream (.MISSING_LARGE_BLOBS:1), so
    the bench converts the image fixture on the fly (cached), reloads it
    through the MAT 7.3 loader, and solves — asserting the trajectory
    lands exactly where the images path did (the two DataHandlers'
    equivalence guarantee, Utilities.cpp:159-199 vs :349-395)."""
    import numpy as np

    from srmeetsps_cuda_tpu.config import SolverConfig
    from srmeetsps_cuda_tpu.io.mat_loader import (load_mat_dataset,
                                                  save_mat_dataset)

    if data is None:
        data, _ = _load_mitten()
    cache_dir = os.path.expanduser("~/.cache/jax_srmeetsps")
    os.makedirs(cache_dir, exist_ok=True)
    mat_path = os.path.join(cache_dir, "mitten_sf2_converted.mat")
    if not os.path.exists(mat_path):
        save_mat_dataset(mat_path, data, fmt="mat73")
    t0 = time.perf_counter()
    data_m = load_mat_dataset(mat_path)
    load_s = time.perf_counter() - t0
    dt, final = _fused_best(data_m, SolverConfig(use_pallas=True))
    out = {
        "matpath_solves_per_sec": round(1.0 / dt, 4),
        "matpath_seconds_per_solve": round(dt, 4),
        "matpath_load_seconds": round(load_s, 3),
        "matpath_final_energy": float(final.energy),
    }
    if headline_energy is not None:
        # Bit-identical inputs -> bit-identical solve.
        out["matpath_energy_matches"] = bool(
            float(final.energy) == float(headline_energy))
    return out


def bench_matpath():
    print(json.dumps(matpath_metrics()))


def bench_4k():
    """4K-class grid on ONE chip — runs the pipelined kernel at th=64
    since the scoped-VMEM fix. Invoke with `python bench.py 4k`."""
    from srmeetsps_cuda_tpu.config import SolverConfig

    data = synthetic_dataset(h=2176, w=3840, sf=2, n=8)
    _timed_solve(data, SolverConfig(use_pallas=True), "4k_sf2_e2e_solve")


def accuracy_metrics():
    """Accuracy north-star for the bench line (VERDICT r2 item 7): solve
    an exactly-consistent synthetic fixture (images rendered with the
    solver's own masked-stencil normals from a known surface, high-freq
    detail invisible to the bicubic init) and report depth RMSE and mean
    normal angular error vs ground truth. A silent numerical regression
    that preserves the Mitten energy scale would still flip
    ``accuracy_ok`` here. Mirrors tests/test_e2e.py::exact_consistency_data
    (kept inline: importing the test package would pin jax to CPU)."""
    import jax.numpy as jnp
    import numpy as np

    from srmeetsps_cuda_tpu.config import RuntimeConfig, SolverConfig
    from srmeetsps_cuda_tpu.io.image_loader import ProblemData
    from srmeetsps_cuda_tpu.ops import gradients as gradops
    from srmeetsps_cuda_tpu.ops.grid import meshgrid_camera
    from srmeetsps_cuda_tpu.ops.normals import normals_from_depth
    from srmeetsps_cuda_tpu.runtime.solver import prepare, solve

    rng = np.random.default_rng(42)
    h, w, sf, n, c = 48, 32, 2, 6, 3
    yy0, xx0 = np.mgrid[0:h, 0:w]
    z_true = (80 + 6 * np.sin(xx0 / 5.0) + 5 * np.cos(yy0 / 6.0)
              + 1.5 * np.sin(2.4 * xx0) * np.cos(2.2 * yy0)
              ).astype(np.float32)
    yy2, xx2 = np.mgrid[0:h, 0:w]
    mask = (((yy2 - h / 2) ** 2 + (xx2 - w / 2) ** 2)
            < (0.45 * min(h, w)) ** 2).astype(np.float32)
    fx = fy = 400.0
    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    gm = gradops.GradientMasks.from_mask(jnp.asarray(mask))
    zt = jnp.asarray(z_true * mask)
    zx, zy = gradops.grad_x(zt, gm), gradops.grad_y(zt, gm)
    xx, yy = meshgrid_camera(h, w, cx, cy)
    N_true, _ = normals_from_depth(zt, zx, zy, xx * mask, yy * mask,
                                   jnp.asarray(mask), fx, fy)
    N_true = np.asarray(N_true)
    rho_true = (0.4 + 0.3 * rng.random((c, 1, 1))).astype(np.float32)
    I = np.empty((n, c, h, w), np.float32)
    for i in range(n):
        s = np.array([0.2, 0.2, -0.9, 0.3]) + 0.2 * rng.standard_normal(4)
        shade = np.einsum("k,khw->hw", s.astype(np.float32), N_true)
        I[i] = (rho_true * shade[None]) * mask
    z0 = np.stack([
        z_true[::sf, ::sf] + 1.0 * rng.standard_normal((h // sf, w // sf))
        for _ in range(n)]).astype(np.float32)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    data = ProblemData(I=I, K=K, mask=mask, sf=sf, z0=z0)

    cfg = SolverConfig(inpaint_iters=64)
    prob, state0 = prepare(data, cfg)
    m = mask != 0
    rmse0 = float(np.sqrt(np.mean((np.asarray(state0.z) - z_true)[m] ** 2)))
    final, _ = solve(data, cfg, RuntimeConfig(), verbose=False)
    rmse = float(np.sqrt(np.mean((np.asarray(final.z) - z_true)[m] ** 2)))
    N = np.asarray(final.N)
    dot = np.clip((N[:3] * N_true[:3]).sum(0), -1, 1)
    err_deg = float(np.degrees(np.arccos(dot[m])).mean())
    # Trend anchor (VERDICT r3 weak 2/7): r03 recorded rmse=1.009 on this
    # fixed fixture (about the injected z0 noise sigma=1.0). Gate depth on
    # an absolute band around that frozen golden so a z-only regression
    # that preserves normals still flips accuracy_ok. (rmse_init is NOT a
    # valid bound: z-RMSE against z_true is not an invariant of the
    # minimised energy — see tests/test_e2e.py — only its stability on
    # this fixed fixture is.)
    rmse_golden = 1.009
    # bf16 image-stack certification: same fixture, same gates. The bf16
    # preset only quantises the image stack I (the two roofline passes);
    # z/rho/N and all solver state stay f32, so accuracy should hold to
    # within the normals gate — this records it every round.
    final_b, _ = solve(data, SolverConfig(inpaint_iters=64,
                                          image_dtype="bfloat16"),
                       RuntimeConfig(), verbose=False)
    rmse_b = float(np.sqrt(np.mean((np.asarray(final_b.z) - z_true)[m] ** 2)))
    Nb = np.asarray(final_b.N)
    dot_b = np.clip((Nb[:3] * N_true[:3]).sum(0), -1, 1)
    err_deg_b = float(np.degrees(np.arccos(dot_b[m])).mean())
    return {
        "rmse": round(rmse, 5),
        "rmse_init": round(rmse0, 5),
        "rmse_golden": rmse_golden,
        "normals_err_deg": round(err_deg, 3),
        # Measured healthy range: ~3.7-10.6 deg (init is ~53 deg); 15 is
        # the same guarded threshold the e2e test enforces.
        "accuracy_ok": bool(err_deg < 15.0
                            and abs(rmse - rmse_golden) < 0.15),
        "bf16_rmse": round(rmse_b, 5),
        "bf16_normals_err_deg": round(err_deg_b, 3),
        "bf16_accuracy_ok": bool(err_deg_b < 15.0
                                 and abs(rmse_b - rmse_golden) < 0.25),
    }


def device_metrics(prob, state, sf, cfg, prefix="", light=False):
    """Dispatch-free device-side metrics via chained-call differencing.

    The axon tunnel adds 100-300 ms of nondeterministic per-call overhead,
    so wall-clock e2e numbers carry that noise; marginal times between two
    chain lengths cancel it. Returns ms/outer-iteration, ms/CG-iteration,
    the effective HBM GB/s of the pipelined CG kernel against its bytes
    model, and the PCG matvec GFLOP/s (BASELINE.json's named north-star:
    the SpMV-equivalent 2 flops/nnz of the 9-point collapsed stencil —
    nnz = 9 per grid pixel, +1 resident ktw plane term at sf=4 — over the
    measured production per-CG-iteration time).

    All big device arrays are passed as jit ARGUMENTS, never closures:
    closure constants are embedded in the serialized module, distort
    while-loop costs, and can blow the axon remote-compile HTTP body
    limit at 1080p-class sizes (CLAUDE.md round-3 gotchas).

    ``light=True`` (the 1080p tier): shorter chains and NO streaming-
    kernel numbers — the full protocol's six 1080p-sized programs
    measured >30 min of cold remote compiles and timed the whole bench
    out (r5); light keeps ms_per_outer_iter, the production
    ms_per_cg_iter, and the matvec GFLOP/s at ~1/3 the compile count."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from srmeetsps_cuda_tpu.models import srps
    from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg
    from srmeetsps_cuda_tpu.solve.pallas_cg import geometry, make_ktw, pick_th
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import cg_pallas_pipelined
    import functools

    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state, prob, sf, cfg)
    np.asarray(st.z)

    def marginal(f, n_lo=4, n_hi=24, reps=5):
        # INTERLEAVED difference-of-bests: the chip's effective rate
        # drifts tens of % over minutes through the tunnel, so timing all
        # reps of one chain length and then all of the other can invert
        # the marginal (a NEGATIVE ms_per_cg_iter shipped from exactly
        # that structure in an r5 pre-run). Alternate lengths within each
        # rep so drift hits both equally (CLAUDE.md measurement rules).
        for n in (n_lo, n_hi):
            np.asarray(jnp.sum(f(n)))  # compile + warm
        best = {n_lo: 1e9, n_hi: 1e9}
        for _ in range(reps):
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(f(n)))
                best[n] = min(best[n], time.perf_counter() - t0)
        return (best[n_hi] - best[n_lo]) / (n_hi - n_lo)

    # ms per full outer iteration (lighting+albedo+depth CG+normals).
    def outer_loop(n, carry, prob):
        def body(i, c):
            z, rho, s = c
            st2 = srps.srps_iteration(
                st._replace(z=z, rho=rho, s=s), prob, sf, cfg)
            return (st2.z, st2.rho, st2.s)
        return lax.fori_loop(0, n, body, carry)[0]

    f_outer = jax.jit(outer_loop, static_argnums=0)
    carry = (st.z, st.rho, st.s)
    if light:
        ms_outer = marginal(lambda n: f_outer(n, carry, prob),
                            n_lo=2, n_hi=8, reps=3) * 1e3
    else:
        ms_outer = marginal(lambda n: f_outer(n, carry, prob)) * 1e3

    # ms per CG iteration: one kernel call at two iteration caps.
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    s_per_iter = None
    if not light:
        rhs = srps.depth_rhs(op, prob, sf, cfg.lam)
        b_res = rhs - srps.depth_matvec(st.z, op, prob, sf, cfg.lam)

        fns = {}
        for mi in (400, 100):
            fns[mi] = jax.jit(functools.partial(
                cg_pallas_pipelined, sf=sf, lam=cfg.lam, tol=1e-30,
                max_iter=mi))
            np.asarray(fns[mi](st.z, b_res, op, prob.gm, ktw)[0])
        best = {400: 1e9, 100: 1e9}
        for _ in range(5):  # interleaved (see marginal())
            for mi in (400, 100):
                t0 = time.perf_counter()
                x, k, r1 = fns[mi](st.z, b_res, op, prob.gm, ktw)
                np.asarray(x.sum())
                best[mi] = min(best[mi], time.perf_counter() - t0)
        s_per_iter = (best[400] - best[100]) / 300

    # Production CG route (VMEM-resident when the grid fits): the number
    # the fused solve actually pays per CG iteration.
    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as _pvm

    s_per_iter_prod = None
    out_err = None
    if s_per_iter is not None and s_per_iter <= 0:
        s_per_iter = None  # drift-inverted streaming marginal: omit
    if _pvm.supported_vmem(h_z := st.z.shape[0], w_z := st.z.shape[1], sf):
        # Chain N=8 kernel calls per sample: at the stencil kernel's
        # ~15 us/iter a single 100-vs-25 cap difference is ~1 ms — smaller
        # than the tunnel's dispatch jitter, which once produced a
        # NEGATIVE marginal here. The chain multiplies the signal 8x.
        def cg_vmem_chain(n_calls, z, op, gm, ktw, z0t, mi):
            def body(i, carry):
                zc, ka = carry
                x, kk, r1 = _pvm.cg_pallas_vmem_fromop(
                    zc, op, gm, ktw, z0t, sf=sf, lam=cfg.lam,
                    tol=1e-30, max_iter=mi)
                return (z * (1.0 + 1e-38 * r1), ka + kk)
            return lax.fori_loop(0, n_calls, body, (z, jnp.int32(0)))

        f_chain = jax.jit(cg_vmem_chain, static_argnums=(0, 6))

        n_calls = 4 if light else 8
        reps = 3 if light else 5
        # caps 100/25 (the production regime): at cap 400 the f32 residual
        # can underflow to exact 0 late in the solve and the kernel's
        # predicated skip would understate the per-iteration cost
        mi_hi, mi_lo = (50, 15) if light else (100, 25)

        def timed_chain(mi):
            t0 = time.perf_counter()
            z, k = f_chain(n_calls, st.z, op, prob.gm, ktw, prob.z0t, mi)
            np.asarray(jnp.sum(z))
            return time.perf_counter() - t0, int(np.asarray(k))

        def measure_prod():
            best, counts = {}, {}
            for mi in (mi_hi, mi_lo):
                z, k = f_chain(n_calls, st.z, op, prob.gm, ktw, prob.z0t,
                               mi)
                np.asarray(z)  # compile + warm
            for _ in range(reps):  # interleaved (see marginal())
                for mi in (mi_hi, mi_lo):
                    t, k = timed_chain(mi)
                    best[mi] = min(best.get(mi, 1e9), t)
                    counts[mi] = k
            return (best[mi_hi] - best[mi_lo]) / (counts[mi_hi]
                                                  - counts[mi_lo])

        s_per_iter_prod = measure_prod()
        if s_per_iter_prod <= 0:   # drift swamped the signal — retry once
            s_per_iter_prod = measure_prod()
        if s_per_iter_prod <= 0:   # still inverted: omit rather than ship
            out_err = "drift-inverted marginal after retry"
            s_per_iter_prod = None

    # Bytes model of one pipelined CG iteration (see pallas_cg_pipe._kernel):
    # phase 0 reads (r, p, 8 packed F rows) x TB-row bands and writes
    # (p, w) x TH; phase 1 reads (x, r, w, p) and writes (x, r) x TH.
    h, w = st.z.shape
    out = {f"{prefix}ms_per_outer_iter": round(ms_outer, 3)}
    if s_per_iter is not None:
        th = pick_th(h, w, pipelined=True)
        geo = geometry(h, w, th)
        tb = geo.th + 2 * _pcg.RING
        bytes_iter = (10 * tb + 2 * geo.th + 6 * geo.th) * geo.n_bands \
            * geo.shape[1] * 4
        gbps = bytes_iter / s_per_iter / 1e9
        out.update({
            f"{prefix}ms_per_cg_iter_streaming": round(s_per_iter * 1e3, 4),
            f"{prefix}cg_bytes_per_iter_mb": round(bytes_iter / 1e6, 1),
            f"{prefix}gbps": round(gbps, 1),
        })
    if s_per_iter_prod is not None:
        out[f"{prefix}ms_per_cg_iter"] = round(s_per_iter_prod * 1e3, 4)
    elif s_per_iter is not None:
        out[f"{prefix}ms_per_cg_iter"] = out[
            f"{prefix}ms_per_cg_iter_streaming"]
    if out_err:
        out[f"{prefix}cg_iter_measure_error"] = out_err
    # PCG matvec GFLOP/s against the production per-iteration time: the
    # matvec is the 9-point spatially-varying stencil (9 mul + 9 add per
    # grid pixel = 2 flops/nnz SpMV-equivalent); sf=4 applies KT^T KT as
    # an extra resident-ktw tilesum (~4 flops/pixel more).
    matvec_flops = (18 + (4 if sf == 4 else 0)) * h * w
    s_prod = (s_per_iter_prod if s_per_iter_prod is not None else s_per_iter)
    if s_prod is not None:
        out[f"{prefix}pcg_matvec_gflops"] = round(
            matvec_flops / s_prod / 1e9, 1)
    return out


def main():
    """Default driver-captured run: ONE JSON line carrying all five
    BASELINE.md configs (VERDICT r3 item 2) —
      1. Mitten images SF=2 (headline: value/seconds/sustained/fast)
      2. MAT-container path (matpath_*)
      3. SF=4 (sf4_*)
      4. batched B=4 (batched4_*)
      5. 1080p-class grid (1080p_*; the sharded flavour is covered by the
         CPU-mesh tests, the driver dryrun, and the hardware-mesh test)
    plus dispatch-free device metrics and the accuracy gates."""
    import jax

    from srmeetsps_cuda_tpu.config import SolverConfig
    from srmeetsps_cuda_tpu.runtime.solver import prepare, _jit_solve_fused

    data, ds = _load_mitten()
    _note("dataset loaded")

    cfg = SolverConfig(use_pallas=True)
    sf = int(data.sf)
    prob, state0 = prepare(data, cfg)

    import jax.numpy as jnp
    import numpy as np

    # Warm-up: compile + one full solve. NOTE: block_until_ready does not
    # reliably block through the remote-TPU tunnel; force a host transfer.
    final, trace = _jit_solve_fused(state0, prob, sf, cfg)
    float(np.asarray(jnp.sum(final.z)))
    _note("headline program compiled + warm")

    # Timed runs. The remote-dispatch overhead through the TPU tunnel has
    # ~150 ms jitter per call; report best-of-N (the reproducible device
    # cost) alongside the mean.
    runs = 5
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        final, trace = _jit_solve_fused(state0, prob, sf, cfg)
        float(np.asarray(jnp.sum(final.z)))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    _note(f"headline timed ({dt:.3f}s best)")
    # Sustained serving rate: async dispatch overlaps tunnel latency.
    dt_sus, _ = _sustained(data, cfg)
    _note(f"sustained timed ({dt_sus:.3f}s/solve)")

    # Fast preset (--fast, r5 re-tune: plain CG @ cap 40 — the jacobi@30
    # preset's win evaporated once kernel_energy became the default;
    # tools/profile_fast.py grid: plain40 = 0.837x device time, final
    # energy +0.12%, fixture ground-truth accuracy slightly BETTER).
    # Measured with the SAME sustained methodology as the headline.
    fast = {}
    try:
        cfg_f = SolverConfig(use_pallas=True, cg_max_iter=40)
        dt_f, fin_f = _sustained(data, cfg_f)
        _note(f"fast preset timed ({dt_f:.3f}s/solve)")
        fast = {
            "fast_sustained_solves_per_sec": round(1.0 / dt_f, 4),
            "fast_device_time_ratio": round(dt_f / dt_sus, 4),
            "fast_final_energy": float(fin_f.energy),
        }
    except Exception as e:  # pragma: no cover - defensive
        fast = {"fast_error": str(e)[:200]}

    # bf16 image stack (--image-dtype bfloat16): the two per-iteration
    # image passes (lighting ATb, s_moments J) run AT the 295 MB f32
    # streaming roofline — bf16 halves their bytes (~0.4 ms of the
    # ~3.8 ms outer iteration). Certified, not default: the default stays
    # f32 for reference-trajectory parity; this block records the speed
    # AND the accuracy cost so the preset is a documented, gated choice.
    bf16 = {}
    try:
        cfg_b = SolverConfig(use_pallas=True, image_dtype="bfloat16")
        dt_b, fin_b = _sustained(data, cfg_b)
        _note(f"bf16 preset timed ({dt_b:.3f}s/solve)")
        e_rel = abs(float(fin_b.energy) - float(final.energy)) / abs(
            float(final.energy))
        bf16 = {
            "bf16_sustained_solves_per_sec": round(1.0 / dt_b, 4),
            "bf16_device_time_ratio": round(dt_b / dt_sus, 4),
            "bf16_final_energy": float(fin_b.energy),
            # Explicit drift gate (VERDICT r4 item 6): the preset's final
            # energy may not silently walk away from the f32 trajectory.
            # r4 measured +3.9% (s quantised in J); r5's f32-s J pass
            # should sit well inside 5%.
            "bf16_energy_delta_rel": round(e_rel, 5),
            "bf16_energy_ok": bool(e_rel < 0.05),
        }
    except Exception as e:  # pragma: no cover - defensive
        bf16 = {"bf16_error": str(e)[:200]}

    solves_per_sec = 1.0 / dt
    result = {
        "metric": "mitten_sf2_e2e_solve",
        "value": round(solves_per_sec, 4),
        "unit": "solves/sec",
        "vs_baseline": round(BASELINE_SECONDS / dt, 3),
        "seconds_per_solve": round(dt, 4),
        "seconds_per_solve_mean": round(sum(times) / runs, 4),
        "sustained_solves_per_sec": round(1.0 / dt_sus, 4),
        "iterations": int(final.iteration),
        "final_energy": float(final.energy),
        "device": str(jax.devices()[0]),
        "dataset": ds or "synthetic",
        **fast,
        **bf16,
    }
    # The device metrics compile the Pallas kernel directly — gate on the
    # same support check estimate_depth uses and never let a failure here
    # eat the one JSON line the driver reads.
    try:
        from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg

        h, w = np.asarray(prob.mask).shape
        if _pcg.supported(h, w, sf, pipelined=True):
            result.update(device_metrics(prob, state0, sf, cfg))
        _note("device metrics done")
    except Exception as e:  # pragma: no cover - defensive
        result["device_metrics_error"] = str(e)[:200]
    # BASELINE configs 2-5, each defensively isolated.
    for name, fn in (
            ("matpath", lambda: matpath_metrics(data, result["final_energy"])),
            ("sf4", lambda: sf4_metrics(data)),
            ("batched", lambda: batched_metrics(4, data=data)),
            ("1080p", metrics_1080p),
    ):
        try:
            result.update(fn())
            _note(f"{name} done")
        except Exception as e:  # pragma: no cover - defensive
            result[f"{name}_error"] = str(e)[:200]
            _note(f"{name} FAILED: {e!s:.120}")
    try:
        result.update(accuracy_metrics())
        _note("accuracy done")
    except Exception as e:  # pragma: no cover - defensive
        result["accuracy_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    _enable_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "batched":
        bench_batched(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif mode == "batched-mixed":
        bench_batched_mixed(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif mode == "batched-bf16":
        bench_batched(int(sys.argv[2]) if len(sys.argv) > 2 else 4,
                      image_dtype="bfloat16")
    elif mode == "sf4":
        bench_sf4()
    elif mode == "1080p":
        bench_1080p()
    elif mode == "4k":
        bench_4k()
    elif mode == "matpath":
        bench_matpath()
    else:
        main()
