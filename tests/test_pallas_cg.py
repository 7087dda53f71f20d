"""Fused Pallas CG parity vs the jnp matrix-free path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import random_mask
from srmeetsps_cuda_tpu.config import SolverConfig
from srmeetsps_cuda_tpu.models import srps
from srmeetsps_cuda_tpu.solve import pallas_cg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_cg, "INTERPRET", True)


def _problem(rng, h, w, sf=2, n=3, c=3):
    mask = random_mask(rng, h, w)
    I = rng.random((n, c, h, w)).astype(np.float32)
    K = [[300.0, 0, w / 2 - 0.5], [0, 300.0, h / 2 - 0.5], [0, 0, 1]]
    z0s = (rng.random((h // sf, w // sf)).astype(np.float32) + 0.5)
    prob = srps.build_problem(I, mask, K, sf, z0s)
    z = (rng.random((h, w)).astype(np.float32) + 0.5) * mask
    st = srps.init_state(prob, z)
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, 1.0)
    return prob, st, mom, op


class TestTilesum:
    @pytest.mark.parametrize("sf", [2, 4])
    def test_matches_reshape(self, rng, sf):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        v = rng.random((16, 256)).astype(np.float32)

        def kernel(v_ref, o_ref):
            o_ref[:] = pallas_cg._tilesum(v_ref[:], sf)

        got = np.asarray(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            interpret=True,
        )(jnp.asarray(v)))
        want = v.reshape(16 // sf, sf, 256 // sf, sf).sum(axis=(1, 3))
        want = np.repeat(np.repeat(want, sf, 0), sf, 1)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestKernelMatvec:
    def test_one_iteration_matches_jnp(self, rng):
        """One kernel-A call (beta=0 => p=r) must equal the jnp matvec."""
        h, w, sf = 40, 48, 2
        prob, st, mom, op = _problem(rng, h, w, sf)
        r = (rng.standard_normal((h, w)).astype(np.float32)
             * np.asarray(prob.mask))
        geo = pallas_cg.geometry(h, w)
        ktw = pallas_cg.make_ktw(prob.mask, prob.masks, sf)
        F = pallas_cg.stack_fields(op, prob.gm, ktw, geo)
        S = jnp.stack([
            pallas_cg.pad_field(jnp.zeros((h, w), jnp.float32), geo),
            pallas_cg.pad_field(jnp.asarray(r), geo),
            jnp.zeros(geo.shape, jnp.float32),
        ])
        p0 = jnp.zeros(geo.shape, jnp.float32)
        p_alt = jnp.zeros(geo.shape, jnp.float32)
        beta = jnp.zeros((1, 1), jnp.float32)
        p_new, S_new, pw = pallas_cg._call_kernel_a(
            S, p0, p_alt, F, beta, geo, 1.0, sf)
        w_got = np.asarray(pallas_cg.unpad_field(S_new[pallas_cg.IW], geo))
        w_want = np.asarray(
            srps.depth_matvec(jnp.asarray(r), op, prob, sf, 1.0))
        np.testing.assert_allclose(w_got, w_want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(pallas_cg.unpad_field(p_new, geo)), r, rtol=1e-6)
        np.testing.assert_allclose(
            float(pw[0, 0]), float(np.vdot(r, w_want)), rtol=1e-3)


class TestFullWidthWrap:
    """w == wp (lane-count multiple): _shift's unmasked column rolls wrap
    real edge columns into real edge columns, and the annihilation
    contract (pallas_cg._shift docstring) is what keeps results exact.
    An all-ones mask maximises exposure: columns 0 and w-1 are active, so
    fwd/bwd masks at the image edge do the annihilating (with w < wp the
    zero padding columns hide any violation)."""

    def test_matvec_exact_at_full_width(self, rng):
        h, w, sf = 32, 128, 2
        mask = np.ones((h, w), np.float32)
        n, c = 2, 3
        I = rng.random((n, c, h, w)).astype(np.float32)
        K = [[300.0, 0, w / 2 - 0.5], [0, 300.0, h / 2 - 0.5], [0, 0, 1]]
        z0s = (rng.random((h // sf, w // sf)).astype(np.float32) + 0.5)
        prob = srps.build_problem(I, mask, K, sf, z0s)
        st = srps.init_state(
            prob, (rng.random((h, w)).astype(np.float32) + 0.5))
        mom = srps.s_moments(prob, st.s)
        op = srps.build_depth_operator(prob, mom, st.rho, st.dz, 1.0)
        r = rng.standard_normal((h, w)).astype(np.float32)
        geo = pallas_cg.geometry(h, w)
        assert geo.shape[1] == w, "fixture must exercise w == wp"
        ktw = pallas_cg.make_ktw(prob.mask, prob.masks, sf)
        F = pallas_cg.stack_fields(op, prob.gm, ktw, geo)
        S = jnp.stack([
            pallas_cg.pad_field(jnp.zeros((h, w), jnp.float32), geo),
            pallas_cg.pad_field(jnp.asarray(r), geo),
            jnp.zeros(geo.shape, jnp.float32),
        ])
        p0 = jnp.zeros(geo.shape, jnp.float32)
        beta = jnp.zeros((1, 1), jnp.float32)
        _, S_new, _ = pallas_cg._call_kernel_a(
            S, p0, jnp.zeros(geo.shape, jnp.float32), F, beta, geo,
            1.0, sf)
        w_got = np.asarray(pallas_cg.unpad_field(S_new[pallas_cg.IW], geo))
        w_want = np.asarray(
            srps.depth_matvec(jnp.asarray(r), op, prob, sf, 1.0))
        np.testing.assert_allclose(w_got, w_want, rtol=2e-4, atol=2e-4)

    def test_vmem_kernel_full_width(self, rng):
        from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            cg_pallas_pipelined_fromop,
        )

        h, w, sf = 32, 128, 2
        mask = np.ones((h, w), np.float32)
        I = rng.random((2, 3, h, w)).astype(np.float32)
        K = [[300.0, 0, w / 2 - 0.5], [0, 300.0, h / 2 - 0.5], [0, 0, 1]]
        z0s = (rng.random((h // sf, w // sf)).astype(np.float32) + 0.5)
        prob = srps.build_problem(I, mask, K, sf, z0s)
        st = srps.init_state(
            prob, (rng.random((h, w)).astype(np.float32) + 0.5))
        mom = srps.s_moments(prob, st.s)
        op = srps.build_depth_operator(prob, mom, st.rho, st.dz, 1.0)
        x_s, k_s, _ = cg_pallas_pipelined_fromop(
            st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
            tol=1e-4, max_iter=3)
        x_v, k_v, _ = pvm.cg_pallas_vmem_fromop(
            st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
            tol=1e-4, max_iter=3)
        assert int(k_s) == int(k_v)
        np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_s),
                                   rtol=5e-5, atol=5e-5)


class TestFullCG:
    @pytest.mark.parametrize("sf", [2, pytest.param(4, marks=pytest.mark.slow)])
    @pytest.mark.parametrize("fused", [False, True])
    def test_matches_jnp_cg(self, rng, sf, fused):
        h, w = 32, 32
        prob, st, mom, op = _problem(rng, h, w, sf)

        def run(max_iter, use_pallas):
            cfg = SolverConfig(cg_tol=1e-4, cg_max_iter=max_iter,
                               use_pallas=use_pallas,
                               pallas_fused_loop=fused and use_pallas)
            return srps.estimate_depth(
                prob, mom, st.rho, st.dz, st.z, sf, cfg)

        # Early-iteration regime: parity IS an invariant here (measured
        # jnp-vs-pallas energy gap through 3 iters is 0 ulp, max|dz| <=
        # 3e-5; by iter 5-8 the ill-conditioned unconverged trajectories
        # have chaotically diverged under any reassociation — gap ~1e-3-
        # 1e-2, and moving the operator build by 1 ulp moves the pallas
        # energy by ~3e-3).
        z3r, e3r, _ = run(3, use_pallas=False)
        z3p, e3p, _ = run(3, use_pallas=True)
        np.testing.assert_allclose(float(e3p), float(e3r), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(z3p), np.asarray(z3r),
                                   rtol=1e-4, atol=1e-4)

        # At-cap regime: the iterate at an unconverged cap is NOT an
        # invariant (measured drift between reassociations is ~8% in
        # Euclidean and ~16% in A-norm at sf=4 — the trajectories truly
        # diverge); correctness is the 3-iter check above. Here we only
        # assert the solver behaves equivalently: same iteration count,
        # same energy to a few percent, iterate in the same ballpark.
        z_ref, e_ref, it_ref = run(25, use_pallas=False)
        z_pal, e_pal, it_pal = run(25, use_pallas=True)
        assert abs(int(it_ref) - int(it_pal)) <= 2, (int(it_ref), int(it_pal))
        np.testing.assert_allclose(float(e_pal), float(e_ref), rtol=5e-2)
        d = np.asarray(z_pal) - np.asarray(z_ref)
        rms = np.sqrt(np.mean(np.asarray(z_ref) ** 2))
        assert np.sqrt(np.mean(d**2)) / rms < 2e-1


# sf=2 (the production Mitten config) stays in the default tier; the
# sf=1/sf=4 variants of the expensive kernel-parity tests run in the
# slow tier (`pytest -m 'not tpu'`) — interpret-mode emulation on the
# CI host costs ~20 s per case.
SF_TIERED = [pytest.param(1, marks=pytest.mark.slow), 2,
             pytest.param(4, marks=pytest.mark.slow)]


class TestFromOpPrologue:
    @pytest.mark.parametrize("sf", SF_TIERED)
    def test_inkernel_r0_matches_host_r0(self, rng, sf):
        """The iteration-0 prologue (r0 = rhs - M x0 built in-kernel from
        the QB fields + KT^T z0s) must track the host-side jnp b_res path:
        identical for a couple of iterations, bounded drift at a cap."""
        import functools
        from srmeetsps_cuda_tpu.ops import grid as gridops
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            cg_pallas_pipelined, cg_pallas_pipelined_fromop)

        h, w = 40, 32
        prob, st, mom, op = _problem(rng, h, w, sf)
        ktw = pallas_cg.make_ktw(prob.mask, prob.masks, sf)
        rhs = srps.depth_rhs(op, prob, sf, 1.0)
        b_res = rhs - srps.depth_matvec(st.z, op, prob, sf, 1.0)
        z0t = gridops.resample_masked_t(prob.z0s, prob.mask, prob.masks, sf)

        for mi, rtol in [(2, 5e-5), (12, 3e-2)]:
            x_h, k_h, r_h = cg_pallas_pipelined(
                st.z, b_res, op, prob.gm, ktw, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            x_k, k_k, r_k = cg_pallas_pipelined_fromop(
                st.z, op, prob.gm, ktw, z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            assert abs(int(k_h) - int(k_k)) <= 1
            np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_h),
                                       rtol=rtol, atol=rtol)


class TestChronopoulosGearCG:
    @pytest.mark.parametrize("sf", SF_TIERED)
    def test_matches_standard_cg(self, rng, sf):
        """The single-reduction (CGS) kernel's alpha/beta recurrences are
        algebraically identical to standard CG: exact parity for a couple
        of iterations, bounded drift at an unconverged cap (the recurrence
        reorders rounding — that is the documented trade)."""
        from srmeetsps_cuda_tpu.ops import grid as gridops
        from srmeetsps_cuda_tpu.solve.pallas_cg_cgs import cg_pallas_cgs
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            cg_pallas_pipelined_fromop)

        h, w = 40, 32
        prob, st, mom, op = _problem(rng, h, w, sf)
        ktw = pallas_cg.make_ktw(prob.mask, prob.masks, sf)
        z0t = gridops.resample_masked_t(prob.z0s, prob.mask, prob.masks, sf)

        for mi, rtol in [(2, 1e-4), (12, 5e-2)]:
            x_s, k_s, r_s = cg_pallas_pipelined_fromop(
                st.z, op, prob.gm, ktw, z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            x_c, k_c, r_c = cg_pallas_cgs(
                st.z, op, prob.gm, ktw, z0t, sf=sf, lam=1.0,
                tol=1e-4, max_iter=mi)
            assert abs(int(k_s) - int(k_c)) <= 1
            d = np.asarray(x_c) - np.asarray(x_s)
            rms = max(float(np.sqrt(np.mean(np.asarray(x_s) ** 2))), 1e-12)
            assert float(np.sqrt(np.mean(d ** 2))) / rms < rtol

    def test_batched_cgs_matches_per_lane(self, rng):
        """Lane-batched CGS == per-lane single CGS solves."""
        import jax
        from srmeetsps_cuda_tpu.ops import grid as gridops
        from srmeetsps_cuda_tpu.solve.pallas_cg_cgs import (
            cg_pallas_cgs, cg_pallas_cgs_batched)

        sf = 2
        lanes = []
        for b in range(2):
            prob, st, mom, op = _problem(np.random.default_rng(b), 32, 32, sf)
            ktw = prob.ktw
            z0t = prob.z0t
            lanes.append((st.z, op, prob.gm, ktw, z0t))
        stack = lambda i: jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[ln[i] for ln in lanes])
        xb, kb, rb = cg_pallas_cgs_batched(
            stack(0), stack(1), stack(2), stack(3), stack(4),
            sf=sf, lam=1.0, tol=1e-4, max_iter=10)
        for b in range(2):
            x1, k1, r1 = cg_pallas_cgs(
                *lanes[b], sf=sf, lam=1.0, tol=1e-4, max_iter=10)
            assert int(kb[b]) == int(k1)
            np.testing.assert_allclose(np.asarray(xb[b]), np.asarray(x1),
                                       rtol=1e-5, atol=1e-6)

    def test_solver_config_routes_cgs(self, rng):
        """estimate_depth honours pallas_cg_variant='cgs' and tracks the
        standard path at the energy level."""
        sf = 2
        prob, st, mom, op = _problem(rng, 32, 32, sf)
        z_p, e_p, it_p = srps.estimate_depth(
            prob, mom, st.rho, st.dz, st.z, sf,
            SolverConfig(cg_tol=1e-4, cg_max_iter=25, use_pallas=True))
        z_c, e_c, it_c = srps.estimate_depth(
            prob, mom, st.rho, st.dz, st.z, sf,
            SolverConfig(cg_tol=1e-4, cg_max_iter=25, use_pallas=True,
                         pallas_cg_variant="cgs"))
        assert abs(int(it_p) - int(it_c)) <= 2
        np.testing.assert_allclose(float(e_c), float(e_p), rtol=5e-2)


class TestBatchedCG:
    def test_lane_batched_matches_per_lane(self, rng):
        """Lane-batched single-launch CG == per-lane single solves."""
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            cg_pallas_pipelined, cg_pallas_pipelined_batched)
        import functools
        import jax

        sf = 2
        lanes = []
        for b in range(2):
            prob, st, mom, op = _problem(np.random.default_rng(b), 32, 32, sf)
            mv = functools.partial(srps.depth_matvec, op=op, prob=prob,
                                   sf=sf, lam=1.0)
            rhs = srps.depth_rhs(op, prob, sf, 1.0)
            b_res = rhs - mv(st.z)
            ktw = pallas_cg.make_ktw(prob.mask, prob.masks, sf)
            lanes.append((st.z, b_res, op, prob.gm, ktw))
        stack = lambda i: jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[ln[i] for ln in lanes])
        xb, kb, rb = cg_pallas_pipelined_batched(
            stack(0), stack(1), stack(2), stack(3), stack(4),
            sf=sf, lam=1.0, tol=1e-4, max_iter=12)
        for b in range(2):
            x1, k1, r1 = cg_pallas_pipelined(
                *lanes[b], sf=sf, lam=1.0, tol=1e-4, max_iter=12)
            assert int(kb[b]) == int(k1)
            np.testing.assert_allclose(np.asarray(xb[b]), np.asarray(x1),
                                       rtol=1e-5, atol=1e-6)

    def test_solve_batched_pallas_matches_jnp(self, rng):
        """solve_batched with the lane-batched pallas CG tracks the vmap-jnp
        path (energies; z drifts within unconverged-CG bounds)."""
        from srmeetsps_cuda_tpu.parallel import batched
        from conftest import random_mask
        import jax

        sf = 2
        probs, states = [], []
        for b in range(2):
            r = np.random.default_rng(b + 10)
            mask = random_mask(r, 32, 32)
            I = r.random((3, 3, 32, 32)).astype(np.float32)
            K = [[300.0, 0, 15.5], [0, 300.0, 15.5], [0, 0, 1]]
            z0s = (r.random((16, 16)).astype(np.float32) + 0.5)
            pb = srps.build_problem(I, mask, K, sf, z0s)
            probs.append(pb)
            states.append(srps.init_state(
                pb, (r.random((32, 32)).astype(np.float32) + 0.5) * mask))
        pb_b = batched.stack_problems(probs)
        st_b = batched.stack_states(states)
        cfg_j = SolverConfig(max_iterations=2)
        cfg_p = SolverConfig(max_iterations=2, use_pallas=True)
        fj, tj = batched.solve_batched(st_b, pb_b, sf, cfg_j)
        fp, tp = batched.solve_batched(st_b, pb_b, sf, cfg_p)
        for b in range(2):
            nj = int(np.isfinite(np.asarray(tj)[b]).sum())
            np_ = int(np.isfinite(np.asarray(tp)[b]).sum())
            assert abs(nj - np_) <= 1
            m = min(nj, np_)
            np.testing.assert_allclose(np.asarray(tp)[b, :m],
                                       np.asarray(tj)[b, :m], rtol=1e-2)


class TestAdaptiveBandHeight:
    def test_pick_th_narrows_with_width(self):
        # Budget is sized against the Mosaic scoped-vmem limit raised via
        # CompilerParams(vmem_limit_bytes) — the default 16 MB limit was
        # the binding constraint before, not physical VMEM (128 MB).
        # Taller bands win while the scoped-VMEM budget allows (the
        # kernels are DMA-issue-latency-bound, see pick_th's docstring).
        assert pallas_cg.pick_th(960, 1280, pipelined=True) == 192
        assert pallas_cg.pick_th(1088, 1920, pipelined=True) == 128
        assert pallas_cg.pick_th(2176, 3840, pipelined=True) == 32
        assert pallas_cg.pick_th(4352, 7680, pipelined=True) == 16
        # single-buffer variants fit taller at the same width
        assert pallas_cg.pick_th(1088, 1920, pipelined=False) == 192

    @pytest.mark.parametrize("th", [16, 32])
    def test_small_bands_match_jnp(self, rng, th, monkeypatch):
        """Force a small band height (as a wide grid would pick) and check
        the pipelined kernel still matches the jnp CG."""
        import functools
        from srmeetsps_cuda_tpu.solve import pallas_cg_pipe
        from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient

        monkeypatch.setattr(pallas_cg_pipe, "pick_th",
                            lambda *a, **k: th)
        sf = 2
        prob, st, mom, op = _problem(rng, 48, 32, sf)
        mv = functools.partial(srps.depth_matvec, op=op, prob=prob,
                               sf=sf, lam=1.0)
        rhs = srps.depth_rhs(op, prob, sf, 1.0)
        b_res = rhs - mv(st.z)
        ktw = pallas_cg.make_ktw(prob.mask, prob.masks, sf)
        x, k, r1 = pallas_cg_pipe.cg_pallas_pipelined(
            st.z, b_res, op, prob.gm, ktw, sf=sf, lam=1.0,
            tol=1e-4, max_iter=12)
        res = conjugate_gradient(mv, b_res, st.z, tol=1e-4, max_iter=12)
        assert abs(int(k) - int(res.iterations)) <= 1
        d = np.asarray(x) - np.asarray(res.x)
        rms = np.sqrt(np.mean(np.asarray(res.x) ** 2))
        assert np.sqrt(np.mean(d ** 2)) / rms < 5e-2


class TestJacobiPallasCG:
    """Jacobi-preconditioned pipelined kernel (invd as a 9th packed F row)
    vs the jnp PCG of solve/cg.py (VERDICT r2 item 4)."""

    @pytest.mark.parametrize("sf", [1, 2])
    def test_matches_jnp_pcg(self, rng, sf):
        from functools import partial

        from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            cg_pallas_pipelined_fromop)

        h, w = 48, 32
        prob, st, mom, op = _problem(rng, h, w, sf)
        lam = 1.0
        matvec = partial(srps.depth_matvec, op=op, prob=prob, sf=sf,
                         lam=lam)
        diag = srps.depth_diag(op, prob, sf, lam)
        rhs = srps.depth_rhs(op, prob, sf, lam)
        b_res = rhs - matvec(st.z)
        for mi in (2, 15):
            ref = conjugate_gradient(matvec, b_res, st.z, tol=1e-4,
                                     max_iter=mi,
                                     precond=lambda r: r / diag)
            x, k, rr = cg_pallas_pipelined_fromop(
                st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=lam,
                tol=1e-4, max_iter=mi, invd=1.0 / diag)
            assert int(k) == int(ref.iterations), mi
            np.testing.assert_allclose(
                float(rr), float(ref.residual_sq), rtol=1e-3)
            tol = dict(rtol=2e-4, atol=2e-4) if mi == 2 else dict(
                rtol=3e-2, atol=3e-2)
            np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                       **tol)

    def test_estimate_depth_routes_jacobi_pallas(self, rng):
        """cfg(use_pallas=True, jacobi=True) must follow the jnp-PCG
        trajectory (same preconditioner, same stopping)."""
        h, w, sf = 48, 32, 2
        prob, st, mom, op = _problem(rng, h, w, sf)
        cfg_p = SolverConfig(use_pallas=True, jacobi_preconditioner=True,
                             cg_max_iter=10)
        cfg_j = SolverConfig(jacobi_preconditioner=True, cg_max_iter=10)
        zp, ep, kp = srps.estimate_depth(prob, mom, st.rho, st.dz, st.z,
                                         sf, cfg_p)
        zj, ej, kj = srps.estimate_depth(prob, mom, st.rho, st.dz, st.z,
                                         sf, cfg_j)
        assert int(kp) == int(kj)
        np.testing.assert_allclose(float(ep), float(ej), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(zp), np.asarray(zj),
                                   rtol=5e-3, atol=5e-3)


class TestBatchedJacobi:
    def test_solve_batched_jacobi_pallas_matches_jnp_pcg(self, rng):
        """Lane-batched Jacobi (invd packed row) tracks the vmapped jnp
        PCG trajectory."""
        from conftest import random_mask
        from srmeetsps_cuda_tpu.parallel import batched

        sf = 2
        probs, states = [], []
        for b in range(2):
            r = np.random.default_rng(b + 20)
            mask = random_mask(r, 32, 32)
            I = r.random((3, 3, 32, 32)).astype(np.float32)
            K = [[300.0, 0, 15.5], [0, 300.0, 15.5], [0, 0, 1]]
            z0s = (r.random((16, 16)).astype(np.float32) + 0.5)
            pb = srps.build_problem(I, mask, K, sf, z0s)
            probs.append(pb)
            states.append(srps.init_state(
                pb, (r.random((32, 32)).astype(np.float32) + 0.5) * mask))
        pb_b = batched.stack_problems(probs)
        st_b = batched.stack_states(states)
        cfg_j = SolverConfig(max_iterations=2, jacobi_preconditioner=True,
                             cg_max_iter=10)
        cfg_p = SolverConfig(max_iterations=2, jacobi_preconditioner=True,
                             cg_max_iter=10, use_pallas=True)
        fj, tj = batched.solve_batched(st_b, pb_b, sf, cfg_j)
        fp, tp = batched.solve_batched(st_b, pb_b, sf, cfg_p)
        for b in range(2):
            nj = int(np.isfinite(np.asarray(tj)[b]).sum())
            np_ = int(np.isfinite(np.asarray(tp)[b]).sum())
            assert abs(nj - np_) <= 1
            m = min(nj, np_)
            np.testing.assert_allclose(np.asarray(tp)[b, :m],
                                       np.asarray(tj)[b, :m], rtol=1e-2)
