"""Fully VMEM-resident Pallas CG (pallas_cg_vmem) parity, interpret mode.

The resident kernel shares per-band arithmetic with the streaming
pipelined kernel (pallas_cg_pipe); band heights may differ, so reduction
order drifts within the usual unconverged-CG bounds (CLAUDE.md testing
philosophy) while early iterations stay tight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_pallas_cg import _problem
from srmeetsps_cuda_tpu.config import SolverConfig
from srmeetsps_cuda_tpu.models import srps
from srmeetsps_cuda_tpu.solve import pallas_cg
from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm
from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import cg_pallas_pipelined_fromop


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_cg, "INTERPRET", True)


class TestSupportGate:
    def test_budget_gate(self):
        # Mitten-class fits; 4K does not (falls back to streaming).
        assert pvm.supported_vmem(960, 1280, 2)
        assert pvm.supported_vmem(960, 1280, 2, jacobi=True)
        assert not pvm.supported_vmem(2176, 3840, 2)
        assert not pvm.supported_vmem(960, 1280, 3)

    def test_1080p_fits(self):
        # 1080p was the streaming kernels' th-degradation case; resident
        # state at 1088x1920 is (5+8)*1104*1920*4 = 110 MB > budget.
        assert not pvm.supported_vmem(1088, 1920, 2)


class TestVmemCG:
    @pytest.mark.parametrize("sf", [1, 2, 4])
    def test_matches_streaming_fromop(self, rng, sf):
        h, w = 40, 32
        prob, st, mom, op = _problem(rng, h, w, sf)
        for mi, rtol in [(2, 5e-5), (12, 3e-2)]:
            x_s, k_s, r_s = cg_pallas_pipelined_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            x_v, k_v, r_v = pvm.cg_pallas_vmem_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            assert abs(int(k_s) - int(k_v)) <= 1
            np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_s),
                                       rtol=rtol, atol=rtol)

    @pytest.mark.parametrize("sf", [1, 2])
    def test_jacobi_matches_jnp_pcg(self, rng, sf):
        from functools import partial

        from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient

        h, w = 48, 32
        prob, st, mom, op = _problem(rng, h, w, sf)
        lam = 1.0
        matvec = partial(srps.depth_matvec, op=op, prob=prob, sf=sf,
                         lam=lam)
        diag = srps.depth_diag(op, prob, sf, lam)
        b_res = srps.depth_rhs(op, prob, sf, lam) - matvec(st.z)
        for mi in (2, 15):
            ref = conjugate_gradient(matvec, b_res, st.z, tol=1e-4,
                                     max_iter=mi,
                                     precond=lambda r: r / diag)
            x, k, rr = pvm.cg_pallas_vmem_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=1e-4, max_iter=mi, invd=1.0 / diag)
            assert int(k) == int(ref.iterations), mi
            np.testing.assert_allclose(
                float(rr), float(ref.residual_sq), rtol=1e-3)
            tol = dict(rtol=2e-4, atol=2e-4) if mi == 2 else dict(
                rtol=3e-2, atol=3e-2)
            np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                       **tol)

    def test_batched_matches_per_lane(self, rng):
        sf = 2
        lanes = []
        for b in range(2):
            prob, st, mom, op = _problem(np.random.default_rng(b), 32, 32,
                                         sf)
            lanes.append((st.z, op, prob.gm, prob.ktw, prob.z0t))
        stack = lambda i: jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[ln[i] for ln in lanes])
        xb, kb, rb = pvm.cg_pallas_vmem_fromop_batched(
            stack(0), stack(1), stack(2), stack(3), stack(4),
            sf=sf, lam=1.0, tol=1e-4, max_iter=10)
        for b in range(2):
            x1, k1, r1 = pvm.cg_pallas_vmem_fromop(
                *lanes[b], sf=sf, lam=1.0, tol=1e-4, max_iter=10)
            assert int(kb[b]) == int(k1)
            np.testing.assert_allclose(np.asarray(xb[b]), np.asarray(x1),
                                       rtol=1e-5, atol=1e-6)


class TestRouting:
    def test_estimate_depth_routes_vmem(self, rng):
        """pallas_vmem_resident=True must track the streaming route (same
        stopping, energies within cross-kernel drift)."""
        sf = 2
        prob, st, mom, op = _problem(rng, 32, 32, sf)
        base = dict(cg_tol=1e-4, cg_max_iter=10, use_pallas=True)
        z_v, e_v, k_v = srps.estimate_depth(
            prob, mom, st.rho, st.dz, st.z, sf,
            SolverConfig(**base, pallas_vmem_resident=True))
        z_s, e_s, k_s = srps.estimate_depth(
            prob, mom, st.rho, st.dz, st.z, sf,
            SolverConfig(**base, pallas_vmem_resident=False))
        assert abs(int(k_v) - int(k_s)) <= 1
        np.testing.assert_allclose(float(e_v), float(e_s), rtol=1e-2)
