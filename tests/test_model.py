"""Estimator-level parity vs the oracle's explicit sparse/dense math."""

import numpy as np
import jax.numpy as jnp

from conftest import random_mask
from srmeetsps_cuda_tpu.config import SolverConfig
from srmeetsps_cuda_tpu.models import srps
from srmeetsps_cuda_tpu.ops import grid, gradients
from srmeetsps_cuda_tpu.ops.grid import masked_select_colmajor as pack
import oracle


def build(problem):
    p = problem
    K = [[p["fx"], 0, p["cx"]], [0, p["fy"], p["cy"]], [0, 0, 1]]
    prob = srps.build_problem(p["I"], p["mask"], K, p["sf"], np.zeros(
        (p["h"] // p["sf"], p["w"] // p["sf"]), np.float32))
    return prob


def oracle_setup(p, prob):
    """Packed (column-major masked) views of everything for the oracle."""
    mask = p["mask"]
    Dx, Dy, imask, _ = oracle.make_gradient(mask.T.ravel(), p["h"], p["w"])
    masks_o, imasks, KT = oracle.lr_mask_and_KT(mask.T.ravel(), p["h"], p["w"], p["sf"])
    I_pack = np.stack([
        np.stack([pack(np.asarray(prob.I[c, i]).reshape(mask.shape), mask) for c in range(p["c"])])
        for i in range(p["n"])
    ])
    xx_p = pack(np.asarray(prob.xx), mask)
    yy_p = pack(np.asarray(prob.yy), mask)
    return Dx, Dy, KT, I_pack, xx_p, yy_p, np.asarray(prob.masks)


class TestLighting:
    def test_vs_oracle(self, small_problem):
        p = small_problem
        prob = build(p)
        st = srps.init_state(prob, p["z"])
        s_new = np.asarray(srps.estimate_lighting(prob, st.rho, st.N))
        _, _, _, I_pack, _, _, _ = oracle_setup(p, prob)
        mask = p["mask"]
        rho_p = np.stack([pack(np.asarray(st.rho[c]), mask) for c in range(p["c"])])
        N_p = np.stack([pack(np.asarray(st.N[k]), mask) for k in range(4)])
        s_want = oracle.lighting_solve(rho_p, N_p, I_pack, np.asarray(st.s))
        np.testing.assert_allclose(s_new, s_want, rtol=2e-4, atol=2e-5)


class TestAlbedo:
    def test_vs_oracle(self, small_problem):
        p = small_problem
        prob = build(p)
        st = srps.init_state(prob, p["z"])
        s = jnp.asarray(p["s"])
        mom = srps.s_moments(prob, s)
        rho_new = np.asarray(srps.estimate_albedo(prob, mom, st.N, st.rho))
        mask = p["mask"]
        _, _, _, I_pack, _, _, _ = oracle_setup(p, prob)
        N_p = np.stack([pack(np.asarray(st.N[k]), mask) for k in range(4)])
        rho_prev_p = np.stack([pack(np.asarray(st.rho[c]), mask) for c in range(p["c"])])
        rho_want = oracle.albedo_solve(N_p, p["s"], I_pack, rho_prev_p)
        got = np.stack([pack(rho_new[c], mask) for c in range(p["c"])])
        np.testing.assert_allclose(got, rho_want, rtol=2e-4, atol=2e-5)


class TestDepthOperator:
    def _common(self, p):
        prob = build(p)
        st = srps.init_state(prob, p["z"])
        s = jnp.asarray(p["s"])
        mom = srps.s_moments(prob, s)
        rho = jnp.asarray(p["rho"])
        op = srps.build_depth_operator(prob, mom, rho, st.dz, 1.0)
        mask = p["mask"]
        Dx, Dy, KT, I_pack, xx_p, yy_p, masks2d = oracle_setup(p, prob)
        rho_p = np.stack([pack(np.asarray(rho[c]), mask) for c in range(p["c"])])
        dz_p = pack(np.asarray(st.dz), mask)
        z0s_pack = pack(np.asarray(prob.z0s), masks2d)
        M, rhs, A, B = oracle.depth_system(
            rho_p, dz_p, p["s"].astype(np.float64), xx_p, yy_p,
            p["fx"], p["fy"], Dx, Dy, KT, z0s_pack, I_pack)
        return prob, st, mom, rho, op, M, rhs, A, B, mask, masks2d, KT, z0s_pack

    def test_matvec_vs_oracle(self, small_problem):
        p = small_problem
        prob, st, mom, rho, op, M, rhs, A, B, mask, masks2d, KT, z0s_pack = self._common(p)
        rng = np.random.default_rng(7)
        v = rng.standard_normal(mask.shape).astype(np.float32) * mask
        got = pack(np.asarray(srps.depth_matvec(jnp.asarray(v), op, prob, p["sf"], 1.0)), mask)
        want = M @ pack(v, mask)
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_rhs_vs_oracle(self, small_problem):
        p = small_problem
        prob, st, mom, rho, op, M, rhs, A, B, mask, masks2d, KT, z0s_pack = self._common(p)
        got = pack(np.asarray(srps.depth_rhs(op, prob, p["sf"], 1.0)), mask)
        np.testing.assert_allclose(got, rhs, rtol=3e-4, atol=3e-4)

    def test_energy_vs_oracle(self, small_problem):
        p = small_problem
        prob, st, mom, rho, op, M, rhs, A, B, mask, masks2d, KT, z0s_pack = self._common(p)
        import jax
        from srmeetsps_cuda_tpu.ops import gradients as gradops
        z = jnp.asarray(p["z"])
        g = gradops.grad_x(z, prob.gm)
        h = gradops.grad_y(z, prob.gm)
        e_data = (
            jnp.sum(op.P11 * g * g + op.P22 * h * h + op.P33 * z * z)
            + 2.0 * jnp.sum(op.P12 * g * h - op.P13 * g * z - op.P23 * h * z)
            - 2.0 * jnp.sum(op.QB1 * g + op.QB2 * h - op.QB3 * z)
            + op.const
        )
        r1 = grid.resample_masked(z, prob.masks, p["sf"]) - prob.z0s
        got = float(jnp.sum(r1 * r1) + e_data)
        want = oracle.depth_energy(pack(p["z"], mask), A, B, KT, z0s_pack)
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_diag_vs_oracle(self, small_problem):
        p = small_problem
        prob, st, mom, rho, op, M, rhs, A, B, mask, masks2d, KT, z0s_pack = self._common(p)
        got = pack(np.asarray(srps.depth_diag(op, prob, p["sf"], 1.0)), mask)
        want = M.diagonal()
        # where() guards unmasked/unconstrained pixels with 1.0
        sel = want > 0
        np.testing.assert_allclose(got[sel], want[sel], rtol=3e-4, atol=3e-4)

    def test_full_depth_solve(self, small_problem):
        p = small_problem
        prob, st, mom, rho, op, M, rhs, A, B, mask, masks2d, KT, z0s_pack = self._common(p)
        cfg = SolverConfig()
        z_new, energy, iters = srps.estimate_depth(
            prob, mom, rho, st.dz, st.z, p["sf"], cfg)
        z0_pack = pack(p["z"], mask)
        b_res = rhs - M @ z0_pack
        z_want, k = oracle.cg(M, b_res, z0_pack, tol=1e-9, max_iter=100)
        got = pack(np.asarray(z_new), mask)
        # The random system is extremely ill-conditioned (cond ~ 1e8) and
        # neither CG converges within the cap, so f32 and f64 iterates
        # legitimately diverge pointwise. Assert instead that (a) our f32
        # solve made at least comparable progress on the *oracle* system,
        # and (b) our collapsed energy equals the oracle energy evaluated
        # at our own solution.
        r_init = np.linalg.norm(b_res)
        r_got = np.linalg.norm(M @ got - rhs)
        r_want = np.linalg.norm(M @ z_want - rhs)
        assert r_got < 0.10 * r_init, (r_got, r_init)
        e_got_oracle = oracle.depth_energy(got, A, B, KT, z0s_pack)
        np.testing.assert_allclose(float(energy), e_got_oracle, rtol=1e-4)
        e_want = oracle.depth_energy(z_want, A, B, KT, z0s_pack)
        assert float(energy) < e_want * 1.01, (float(energy), e_want)


class TestIterationAndFusedLoop:
    def test_energy_decreases(self, small_problem):
        p = small_problem
        prob = build(p)
        st = srps.init_state(prob, p["z"])
        cfg = SolverConfig()
        st1 = srps.srps_iteration(st, prob, p["sf"], cfg)
        st2 = srps.srps_iteration(st1, prob, p["sf"], cfg)
        assert np.isfinite(float(st1.energy))
        assert float(st2.energy) <= float(st1.energy) * 1.01

    def test_fused_loop_matches_stepwise(self, small_problem):
        p = small_problem
        prob = build(p)
        cfg = SolverConfig()
        st = srps.init_state(prob, p["z"])
        final, trace = srps.solve_fused(st, prob, p["sf"], cfg)
        # stepwise reference
        st2 = srps.init_state(prob, p["z"])
        energies = []
        while True:
            st2 = srps.srps_iteration(st2, prob, p["sf"], cfg)
            energies.append(float(st2.energy))
            if bool(srps.should_stop(st2, cfg)):
                break
        assert int(final.iteration) == len(energies)
        # Fused and stepwise compile to different XLA programs (different
        # fusion choices => different f32 rounding); trajectories agree to
        # accumulated roundoff, not bitwise.
        np.testing.assert_allclose(
            np.asarray(trace)[: len(energies)], energies, rtol=1e-3)


class TestLightingSingular:
    def test_degenerate_channel_keeps_previous_s(self, small_problem):
        """All-zero rho on one channel makes that channel's ATA singular;
        the reference's warm-started CG never updates s there
        (devicecalls.cu:408-444, zero residual at warm start)."""
        p = small_problem
        prob = build(p)
        st = srps.init_state(prob, p["z"])
        rho = st.rho.at[1].set(0.0)  # kill channel 1 everywhere
        s_prev = jnp.asarray(p["s"])
        s_new = np.asarray(srps.estimate_lighting(prob, rho, st.N, s_prev))
        assert np.all(np.isfinite(s_new))
        np.testing.assert_array_equal(s_new[:, 1], np.asarray(s_prev)[:, 1])
        # Healthy channels still get a genuine (different) solution.
        assert not np.allclose(s_new[:, 0], np.asarray(s_prev)[:, 0])

    def test_iteration_survives_degenerate_channel(self, small_problem):
        """A full srps_iteration with a dead channel must stay finite (the
        NaN would otherwise poison energy and the stopping rule)."""
        p = small_problem
        prob = build(p)
        # Zero channel 2 of the images: albedo's closed form keeps rho_prev
        # there, and lighting's guard keeps s.
        prob = prob._replace(I=prob.I.at[2].set(0.0),
                             SI2=prob.SI2.at[2].set(0.0))
        st = srps.init_state(prob, p["z"])
        st = st._replace(rho=st.rho.at[2].set(0.0))
        cfg = SolverConfig()
        out = srps.srps_iteration(st, prob, p["sf"], cfg)
        assert np.isfinite(float(out.energy))
        assert np.all(np.isfinite(np.asarray(out.s)))
        assert np.all(np.isfinite(np.asarray(out.z)))
