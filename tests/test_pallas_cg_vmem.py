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

from test_pallas_cg import SF_TIERED, _problem
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
        # Mitten-class fits fully; 1080p via the hybrid mode; 4K does not
        # (falls back to streaming).
        assert pvm.supported_vmem(960, 1280, 2)
        assert pvm.supported_vmem(960, 1280, 2, jacobi=True)
        assert pvm.supported_vmem(1088, 1920, 2)
        assert not pvm.supported_vmem(2176, 3840, 2)
        assert not pvm.supported_vmem(960, 1280, 3)


class TestVmemCG:
    @pytest.mark.parametrize("sf", SF_TIERED)
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

    # sf=4 exercises the riskiest *refs unpack of the stencil kernels:
    # BOTH the ktwv (sf=4 tilesum) and ivdv (jacobi) scratch planes are
    # present (advisor r3 finding). Its long horizon stops at 10: by
    # iteration ~13 the sf=4 preconditioned residual stagnates in the
    # f32 noise floor and iterates drift chaotically between ANY two
    # arithmetic orders (the direct kernel diverges from jnp PCG
    # identically to the stencil one, maxdiff ~8 at mi=13) — per the
    # testing philosophy that regime is not an invariant.
    @pytest.mark.parametrize("sf", SF_TIERED)
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
        for mi in (2, 15 if sf < 4 else 10):
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


class TestHybridMode:
    """1080p-class residency: state resident, F streamed per band.  Small
    test grids always satisfy the full-residency budget, so the hybrid
    kernel is forced via vmem_mode."""

    @pytest.fixture(autouse=True)
    def force_hybrid(self, monkeypatch):
        monkeypatch.setattr(pvm, "vmem_mode",
                            lambda *a, **k: "hybrid")

    @pytest.mark.parametrize("sf", SF_TIERED)
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

    def test_jacobi_matches_jnp_pcg(self, rng):
        from functools import partial

        from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient

        h, w, sf = 48, 32, 2
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
            tol = dict(rtol=2e-4, atol=2e-4) if mi == 2 else dict(
                rtol=3e-2, atol=3e-2)
            np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                       **tol)

    @pytest.mark.slow
    def test_multiband_geometry(self, rng, monkeypatch):
        """Force several bands (th=16 over h=48) so the double-buffered
        F window actually cycles.  Tight parity at 2 iterations (the
        banded-halo invariant: measured f32-exact, ~7e-7); RMS-bounded at
        8 (different band partitions reorder reductions — the documented
        unconverged-CG drift)."""
        monkeypatch.setattr(pvm, "vmem_th", lambda *a: 16)
        h, w, sf = 48, 32, 2
        prob, st, mom, op = _problem(rng, h, w, sf)
        for mi, check in [(2, "tight"), (8, "rms")]:
            x_s, k_s, _ = cg_pallas_pipelined_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            x_v, k_v, _ = pvm.cg_pallas_vmem_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            assert abs(int(k_s) - int(k_v)) <= 1
            if check == "tight":
                np.testing.assert_allclose(np.asarray(x_v),
                                           np.asarray(x_s),
                                           rtol=1e-5, atol=1e-5)
            else:
                d = np.asarray(x_v) - np.asarray(x_s)
                rms = np.sqrt(np.mean(np.asarray(x_s) ** 2))
                assert np.sqrt(np.mean(d ** 2)) / rms < 5e-2


class TestFullPackedMode:
    """Mid-size grids where the 3 extra unpacked mask rows don't fit:
    resident F keeps the 8-row packed-bitmask layout. Small test grids
    always fit the rows layout, so the packed-full kernel is forced."""

    @pytest.fixture(autouse=True)
    def force_full_packed(self, monkeypatch):
        monkeypatch.setattr(pvm, "vmem_mode",
                            lambda *a, **k: "full_packed")

    @pytest.mark.parametrize("sf", [1, 2])
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

    def test_jacobi_matches_jnp_pcg(self, rng):
        from functools import partial

        from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient

        h, w, sf = 48, 32, 2
        prob, st, mom, op = _problem(rng, h, w, sf)
        lam = 1.0
        matvec = partial(srps.depth_matvec, op=op, prob=prob, sf=sf,
                         lam=lam)
        diag = srps.depth_diag(op, prob, sf, lam)
        for mi in (2, 15):
            b_res = srps.depth_rhs(op, prob, sf, lam) - matvec(st.z)
            ref = conjugate_gradient(matvec, b_res, st.z, tol=1e-4,
                                     max_iter=mi,
                                     precond=lambda r: r / diag)
            x, k, rr = pvm.cg_pallas_vmem_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=1e-4, max_iter=mi, invd=1.0 / diag)
            assert int(k) == int(ref.iterations), mi
            tol = dict(rtol=2e-4, atol=2e-4) if mi == 2 else dict(
                rtol=3e-2, atol=3e-2)
            np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                       **tol)


class TestFullModeForced:
    """The direct (mask-gated matvec) resident kernel still serves grids
    past the stencil budget; small grids (any sf) now naturally route to
    the stencil kernel, so force "full" to keep covering it."""

    @pytest.fixture(autouse=True)
    def force_full(self, monkeypatch):
        monkeypatch.setattr(pvm, "vmem_mode", lambda *a, **k: "full")

    @pytest.mark.parametrize("sf", [1, 2])
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


class TestStencilWrapColumns:
    """w == wp: lane rolls wrap real image columns; the built C must be
    exactly zero there (edge-mask argument in _build_c_band)."""

    @pytest.mark.slow
    def test_w_equals_wp(self, rng):
        h, w, sf = 24, 128, 2
        prob, st, mom, op = _problem(rng, h, w, sf)
        assert pvm.vmem_mode(h, w, sf,
                             _check_backend=False) == "full_stencil"
        for mi, rtol in [(2, 5e-5), (12, 3e-2)]:
            x_s, k_s, _ = cg_pallas_pipelined_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            x_v, k_v, _ = pvm.cg_pallas_vmem_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            assert abs(int(k_s) - int(k_v)) <= 1
            np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_s),
                                       rtol=rtol, atol=rtol)


class TestHybridStencilMode:
    """1080p-class stencil residency: state resident, C planes built by
    the prologue into an HBM scratch output and re-streamed per band.
    Its arithmetic is IDENTICAL to full_stencil (same _build_c_band /
    _stencil_w on the same bands), so the strongest check is bit
    equality between the two modes."""

    def _run(self, mode, monkeypatch_target, *args, **kw):
        real = pvm.vmem_mode
        pvm.vmem_mode = lambda *a, **k: mode
        try:
            return pvm.cg_pallas_vmem_fromop(*args, **kw)
        finally:
            pvm.vmem_mode = real

    @pytest.mark.parametrize("sf", [1, 2, 4])
    def test_bit_identical_to_full_stencil(self, rng, sf):
        prob, st, mom, op = _problem(rng, 40, 32, sf)
        for mi in (2, 12):
            xf, kf, rf = self._run("full_stencil", None, st.z, op, prob.gm,
                                   prob.ktw, prob.z0t, sf=sf, lam=1.0,
                                   tol=1e-4, max_iter=mi)
            xh, kh, rh = self._run("hybrid_stencil", None, st.z, op,
                                   prob.gm, prob.ktw, prob.z0t, sf=sf,
                                   lam=1.0, tol=1e-4, max_iter=mi)
            assert int(kf) == int(kh)
            np.testing.assert_array_equal(np.asarray(xf), np.asarray(xh))
            np.testing.assert_array_equal(float(rf), float(rh))

    @pytest.mark.slow
    def test_multiband_bit_identical(self, rng, monkeypatch):
        """th=16 over h=48: the C window double-buffer and the prologue's
        copy-out drain actually cycle."""
        monkeypatch.setattr(pvm, "vmem_th", lambda *a: 16)
        prob, st, mom, op = _problem(rng, 48, 32, 2)
        xf, kf, _ = self._run("full_stencil", None, st.z, op, prob.gm,
                              prob.ktw, prob.z0t, sf=2, lam=1.0,
                              tol=1e-4, max_iter=8)
        xh, kh, _ = self._run("hybrid_stencil", None, st.z, op, prob.gm,
                              prob.ktw, prob.z0t, sf=2, lam=1.0,
                              tol=1e-4, max_iter=8)
        assert int(kf) == int(kh)
        np.testing.assert_array_equal(np.asarray(xf), np.asarray(xh))

    def test_jacobi_matches_jnp_pcg(self, rng):
        from functools import partial

        from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient

        h, w, sf = 48, 32, 2
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
            x, k, rr = self._run("hybrid_stencil", None, st.z, op, prob.gm,
                                 prob.ktw, prob.z0t, sf=sf, lam=lam,
                                 tol=1e-4, max_iter=mi, invd=1.0 / diag)
            assert int(k) == int(ref.iterations), mi
            tol = dict(rtol=2e-4, atol=2e-4) if mi == 2 else dict(
                rtol=3e-2, atol=3e-2)
            np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                       **tol)


class TestModeTable:
    def test_mode_by_size(self):
        # Mitten-class, sf<=2: the 9-plane stencil collapse is preferred.
        assert (pvm.vmem_mode(960, 1280, 2, _check_backend=False)
                == "full_stencil")
        assert (pvm.vmem_mode(960, 1280, 2, jacobi=True,
                              _check_backend=False) == "full_stencil")
        # sf=4: the KT^T KT term rides as a resident ktw plane + tilesum
        # on top of the 9-plane A^T A collapse.
        assert (pvm.vmem_mode(960, 1280, 4, _check_backend=False)
                == "full_stencil")
        assert (pvm.vmem_mode(1088, 1920, 4, _check_backend=False)
                == "hybrid_stencil")
        # Mid-size: the 11-row layout overflows the budget, the 8-row
        # packed one still fits fully resident.
        assert pvm.vmem_mode(1024, 1664, 2,
                             _check_backend=False) == "full_packed"
        # 1080p-class, sf<=2: state resident + streamed stencil planes.
        assert pvm.vmem_mode(1088, 1920, 2,
                             _check_backend=False) == "hybrid_stencil"
        assert pvm.vmem_mode(1088, 1920, 2, jacobi=True,
                             _check_backend=False) == "hybrid_stencil"
        assert pvm.vmem_mode(2176, 3840, 2, _check_backend=False) is None


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


class TestPackEquivalence:
    """The pad-per-row pack refactor (rows padded BEFORE stacking so XLA
    can in-place-update the carried stack) must be bit-identical to the
    original stack-then-pad form."""

    def test_stack_fields_rows_matches_stack_then_pad(self, rng):
        prob, st, mom, op = _problem(rng, 40, 36)
        th = pvm.vmem_th(40, 36)
        geo = pallas_cg.geometry(40, 36, th)
        got = pvm.stack_fields_rows(op, prob.gm, prob.ktw, geo)
        rows = jnp.stack([op.P11, op.P12, op.P13, op.P22, op.P23, op.P33,
                          prob.gm.fwd_x, prob.gm.bwd_x, prob.gm.fwd_y,
                          prob.gm.bwd_y, prob.ktw])
        want = pallas_cg.pad_field(rows, geo)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_stack_fields_packed_matches_stack_then_pad(self, rng):
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            stack_fields_packed)

        prob, st, mom, op = _problem(rng, 40, 36)
        geo = pallas_cg.geometry(
            40, 36, pallas_cg.pick_th(40, 36, pipelined=True))
        got = stack_fields_packed(op, prob.gm, prob.ktw, geo)
        mb = (prob.gm.fwd_x.astype(jnp.int32)
              | (prob.gm.bwd_x.astype(jnp.int32) << 1)
              | (prob.gm.fwd_y.astype(jnp.int32) << 2)
              | (prob.gm.bwd_y.astype(jnp.int32) << 3))
        mb_f = jax.lax.bitcast_convert_type(mb, jnp.float32)
        rows = jnp.stack([op.P11, op.P12, op.P13, op.P22, op.P23, op.P33,
                          prob.ktw, mb_f])
        want = pallas_cg.pad_field(rows, geo)
        got_i = jax.lax.bitcast_convert_type(got, jnp.int32)
        want_i = jax.lax.bitcast_convert_type(want, jnp.int32)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


class TestKernelEnergy:
    """In-kernel energy tracking must reproduce srps.depth_energy at the
    final iterate up to f32 reassociation, in every residency mode.

    The implementation evaluates the energy once at the warm start in the
    it=0 prologue in well-conditioned residual form (see
    pallas_cg_vmem._e0_band, which also documents why the quadratic
    identity E = -x'Mx - 2x'b is f32-unusable), then tracks it through the
    solve with the scalar CG identity E -= alpha * <z, r> (= alpha * r1,
    by CG orthogonality) — pure SMEM math, no extra sweeps."""

    CASES = [
        ("full_stencil", 2, False),
        ("full_stencil", 2, True),
        pytest.param("full_stencil", 4, True, marks=pytest.mark.slow),
        ("hybrid_stencil", 2, False),
        pytest.param("hybrid_stencil", 4, False, marks=pytest.mark.slow),
        pytest.param("full", 2, False, marks=pytest.mark.slow),
        pytest.param("full_packed", 2, True, marks=pytest.mark.slow),
        ("hybrid", 2, False),
        pytest.param("hybrid", 1, True, marks=pytest.mark.slow),
    ]

    @pytest.mark.parametrize("mode,sf,jacobi", CASES)
    def test_matches_depth_energy(self, rng, mode, sf, jacobi, monkeypatch):
        monkeypatch.setattr(pvm, "vmem_mode", lambda *a, **k: mode)
        h, w = 16, 32
        prob, st, mom, op = _problem(rng, h, w, sf)
        invd = (1.0 / srps.depth_diag(op, prob, sf, 1.0)) if jacobi else None
        x, k, r1, e_part = pvm.cg_pallas_vmem_fromop(
            st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
            tol=1e-9, max_iter=12, invd=invd, with_energy=True,
            z0u=prob.z0up)
        e_kern = float(e_part + op.const)
        e_ref = float(srps.depth_energy(x * prob.mask, op, prob, sf, 1.0))
        np.testing.assert_allclose(e_kern, e_ref, rtol=5e-4)

    def test_estimate_depth_routes_kernel_energy(self, rng):
        """estimate_depth with kernel_energy on/off: same solution, same
        energy to f32 reassociation (the vmem route is taken on this
        grid in interpret mode)."""
        prob, st, mom, op = _problem(rng, 16, 32, 2)
        base = dict(use_pallas=True, cg_max_iter=8)
        z_on, e_on, k_on = srps.estimate_depth(
            prob, mom, st.rho, st.dz, st.z, 2,
            SolverConfig(**base, kernel_energy=True))
        z_off, e_off, k_off = srps.estimate_depth(
            prob, mom, st.rho, st.dz, st.z, 2,
            SolverConfig(**base, kernel_energy=False))
        assert int(k_on) == int(k_off)
        np.testing.assert_array_equal(np.asarray(z_on), np.asarray(z_off))
        np.testing.assert_allclose(float(e_on), float(e_off), rtol=5e-4)

    def test_full_solve_outer_iteration_parity(self, rng):
        """End-to-end fused solve, kernel_energy on vs off: the tracked
        energy feeds the outer stopping rule (SRPS.cu:297-301), so its
        ~5e-4 rel drift could in principle flip a near-boundary stop
        (ADVICE r4). Assert the outer-iteration count and final energy
        agree on the realistic fixture — the parity claim config.py
        documents."""
        from test_e2e import synthetic_data
        from srmeetsps_cuda_tpu.config import RuntimeConfig
        from srmeetsps_cuda_tpu.runtime.solver import solve

        data, _ = synthetic_data(rng, h=32, w=32, sf=2)
        base = dict(use_pallas=True, cg_max_iter=10, inpaint_iters=32,
                    max_iterations=4)
        finals = {}
        for ke in (True, False):
            finals[ke], _ = solve(
                data, SolverConfig(**base, kernel_energy=ke),
                RuntimeConfig(fused_outer_loop=True), verbose=False)
        assert int(finals[True].iteration) == int(finals[False].iteration)
        np.testing.assert_allclose(float(finals[True].energy),
                                   float(finals[False].energy), rtol=5e-4)

    def test_batched_energy_matches_per_lane(self, rng):
        from srmeetsps_cuda_tpu.parallel import batched as pbat

        sf = 2
        lanes = []
        for b in range(2):
            prob, st, mom, op = _problem(np.random.default_rng(b), 16, 32,
                                         sf)
            lanes.append((st.z, op, prob.gm, prob.ktw, prob.z0t, prob, st))
        stack = lambda i: jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[ln[i] for ln in lanes])
        z0us = jnp.stack([ln[5].z0up for ln in lanes])
        xb, kb, rb, eb = pvm.cg_pallas_vmem_fromop_batched(
            stack(0), stack(1), stack(2), stack(3), stack(4),
            sf=sf, lam=1.0, tol=1e-9, max_iter=8, with_energy=True,
            z0u=z0us)
        for b in range(2):
            z, op, gm, ktw, z0t, prob, st = lanes[b]
            e_ref = float(srps.depth_energy(
                xb[b] * prob.mask, op, prob, sf, 1.0))
            e_kern = float(eb[b] + op.const)
            np.testing.assert_allclose(e_kern, e_ref, rtol=5e-4)
