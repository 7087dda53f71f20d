"""Fast-mode evidence run: can Jacobi-PCG at a LOWER CG cap match plain
CG@100's end-to-end accuracy in less device time?

Jacobi costs +4.4%/CG-iteration but reaches a 32% lower true residual at
the cap (tools/profile_jacobi.py). This grid runs the FULL fused solve on
Mitten SF=2 for plain@100 vs jacobi@{100,60,50,40,30}, interleaved
(drift-proof), recording wall time, final energy (the objective — the
quality measure Mitten supports), and outer/CG iteration counts; then the
exact-consistency fixture (bench.accuracy_metrics geometry) for depth
RMSE + normal angular error per config.

Run ALONE on the chip: python tools/profile_fast.py
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

from bench import find_dataset, synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare, _jit_solve_fused  # noqa: E402

CONFIGS = [
    ("plain100", dict(jacobi_preconditioner=False, cg_max_iter=100)),
    ("plain40", dict(jacobi_preconditioner=False, cg_max_iter=40)),
    ("jac30", dict(jacobi_preconditioner=True, cg_max_iter=30)),
    ("jac25", dict(jacobi_preconditioner=True, cg_max_iter=25)),
    ("jac20", dict(jacobi_preconditioner=True, cg_max_iter=20)),
]


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    sf = int(data.sf)

    runs = {}
    for name, kw in CONFIGS:
        cfg = SolverConfig(use_pallas=True, **kw)
        prob, st0 = prepare(data, cfg)
        final, trace = _jit_solve_fused(st0, prob, sf, cfg)
        float(np.asarray(jnp.sum(final.z)))  # compile + warm
        runs[name] = dict(cfg=cfg, prob=prob, st0=st0, best=1e9,
                          energy=float(final.energy),
                          outer_iters=int(final.iteration),
                          trace=np.asarray(trace).tolist())
        print(f"warm {name}: energy={runs[name]['energy']:.4f} "
              f"outer={runs[name]['outer_iters']}")

    # Interleaved SUSTAINED timing (r5): 6 back-to-back async solves per
    # sample, one scalar fetch — the ~20 ms/dispatch tunnel jitter buried
    # the few-ms device delta under the old single-dispatch best-of-6.
    # Configs cycle within each rep so chip-rate drift hits all equally.
    for rep in range(6):
        for name, _ in CONFIGS:
            r = runs[name]
            t0 = time.perf_counter()
            for _ in range(6):
                final, _ = _jit_solve_fused(r["st0"], r["prob"], sf,
                                            r["cfg"])
            float(np.asarray(final.energy))
            r["best"] = min(r["best"], (time.perf_counter() - t0) / 6)

    print("\n== Mitten SF=2 fused solve (interleaved sustained, "
          "best-of-6 chains) ==")
    base_e = runs["plain100"]["energy"]
    for name, _ in CONFIGS:
        r = runs[name]
        print(f"{name:9s} wall={r['best']*1e3:7.1f} ms  "
              f"energy={r['energy']:.4f} ({r['energy']/base_e:+.4%} vs plain)"
              f"  outer={r['outer_iters']}")

    # Accuracy fixture: ground-truth RMSE per config (tiny grid; the
    # Pallas kernels don't support it so this exercises the jnp CG/PCG
    # path — same algorithm, so the cap-vs-accuracy trade transfers).
    from srmeetsps_cuda_tpu.config import RuntimeConfig
    from srmeetsps_cuda_tpu.runtime.solver import solve

    print("\n== exact-consistency fixture (rmse / normals deg) ==")
    fix = _build_fixture()
    for name, kw in CONFIGS:
        cfg = SolverConfig(inpaint_iters=64, use_pallas=True, **kw)
        final, _tr = solve(fix["data"], cfg, RuntimeConfig(), verbose=False)
        m = fix["mask"] != 0
        rmse = float(np.sqrt(np.mean(
            (np.asarray(final.z) - fix["z_true"])[m] ** 2)))
        N = np.asarray(final.N)
        dot = np.clip((N[:3] * fix["N_true"][:3]).sum(0), -1, 1)
        err_deg = float(np.degrees(np.arccos(dot[m])).mean())
        print(f"{name:9s} rmse={rmse:.5f}  normals={err_deg:.3f} deg  "
              f"outer={int(final.iteration)}")


def _build_fixture():
    """The bench.accuracy_metrics fixture, returned raw for per-config use."""
    from srmeetsps_cuda_tpu.io.image_loader import ProblemData
    from srmeetsps_cuda_tpu.ops import gradients as gradops
    from srmeetsps_cuda_tpu.ops.grid import meshgrid_camera
    from srmeetsps_cuda_tpu.ops.normals import normals_from_depth

    rng = np.random.default_rng(42)
    h, w, sf, n, c = 48, 32, 2, 6, 3
    yy0, xx0 = np.mgrid[0:h, 0:w]
    z_true = (80 + 6 * np.sin(xx0 / 5.0) + 5 * np.cos(yy0 / 6.0)
              + 1.5 * np.sin(2.4 * xx0) * np.cos(2.2 * yy0)).astype(np.float32)
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
    return dict(data=ProblemData(I=I, K=K, mask=mask, sf=sf, z0=z0),
                mask=mask, z_true=z_true, N_true=N_true)


if __name__ == "__main__":
    main()
