"""Stored-golden regression on the energy trajectory (SURVEY.md section 4:
"golden-value regression on energy/RMSE per iteration").

The values below were computed by this framework on the deterministic
fixture at commit time (CPU f32). They guard against silent semantic
regressions in any operator/estimator: a change that shifts the trajectory
by more than accumulated-roundoff slack fails here even if all the
oracle-parity tests still pass structurally.
"""

import numpy as np

from srmeetsps_cuda_tpu.config import SolverConfig
from srmeetsps_cuda_tpu.models import srps

GOLDEN_ENERGIES = [2.49978, 0.794323, 0.717892, 0.692907]


def _fixture():
    rng = np.random.default_rng(42)
    h, w, sf, n, c = 32, 32, 2, 4, 3
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - 16) ** 2 + (xx - 16) ** 2) < 13 ** 2).astype(np.float32)
    z_true = (60 + 4 * np.sin(xx / 4.0) + 3 * np.cos(yy / 5.0)).astype(np.float32)
    I = np.empty((n, c, h, w), np.float32)
    for i in range(n):
        s = np.array([0.2, 0.2, -0.9, 0.3]) + 0.2 * rng.standard_normal(4)
        zx = np.gradient(z_true, axis=1)
        zy = np.gradient(z_true, axis=0)
        n1, n2 = 400 * zx, 400 * zy
        n3 = -z_true - (xx - 15.5) * zx - (yy - 15.5) * zy
        nrm = np.sqrt(n1**2 + n2**2 + n3**2) + 1e-9
        N = np.stack([n1 / nrm, n2 / nrm, n3 / nrm, np.ones_like(z_true)])
        shade = np.einsum("k,khw->hw", s.astype(np.float32), N)
        for ch in range(c):
            I[i, ch] = np.clip(0.3 * (ch + 1) * shade, 0, None)
    K = [[400.0, 0, 15.5], [0, 400.0, 15.5], [0, 0, 1]]
    z0s = z_true[::2, ::2].astype(np.float32)
    return I, mask, K, sf, z0s, z_true


def test_energy_trajectory_matches_golden():
    I, mask, K, sf, z0s, z_true = _fixture()
    prob = srps.build_problem(I, mask, K, sf, z0s)
    st = srps.init_state(prob, z_true * mask)
    cfg = SolverConfig()
    got = []
    for _ in range(len(GOLDEN_ENERGIES)):
        st = srps.srps_iteration(st, prob, sf, cfg)
        got.append(float(st.energy))
    # Unconverged f32 CG drifts with any reduction-order change, so the
    # slack is loose-ish; a semantic bug moves these by far more.
    np.testing.assert_allclose(got, GOLDEN_ENERGIES, rtol=3e-2)
