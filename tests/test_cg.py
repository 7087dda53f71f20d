"""Conjugate-gradient unit tests."""

import numpy as np
import jax.numpy as jnp

from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient
import oracle


def _spd(rng, n, cond=100.0):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eig = np.geomspace(1.0, cond, n)
    return (Q * eig) @ Q.T


class TestCG:
    def test_solves_spd_system(self, rng):
        n = 64
        A = _spd(rng, n).astype(np.float32)
        x_true = rng.standard_normal(n).astype(np.float32)
        b = A @ x_true
        res = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
            jnp.zeros(n, jnp.float32), tol=1e-7, max_iter=500)
        np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-3, atol=1e-3)

    def test_warm_start_convention(self, rng):
        """Caller residualises: solve from x0 with b_res = b - A x0."""
        n = 32
        A = _spd(rng, n).astype(np.float32)
        x_true = rng.standard_normal(n).astype(np.float32)
        b = A @ x_true
        x0 = x_true + 0.01 * rng.standard_normal(n).astype(np.float32)
        b_res = b - A @ x0
        res = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b_res),
            jnp.asarray(x0), tol=1e-7, max_iter=500)
        np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-3, atol=1e-4)
        # warm start should take far fewer iterations than cold
        cold = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
            jnp.zeros(n, jnp.float32), tol=1e-7, max_iter=500)
        assert int(res.iterations) <= int(cold.iterations)

    def test_matches_reference_iteration_count(self, rng):
        """Same stopping rule as devicecalls.cu:229-279 (squared residual,
        k <= max_iter with one extra admitted iteration)."""
        n = 48
        A = _spd(rng, n, cond=1e4).astype(np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        res = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
            jnp.zeros(n, jnp.float32), tol=1e-5, max_iter=40)
        import scipy.sparse as sp

        x_o, k_o = oracle.cg(sp.csr_matrix(A.astype(np.float64)),
                             b.astype(np.float64), np.zeros(n), tol=1e-5,
                             max_iter=40)
        # f32 vs f64 may differ by an iteration or two near the threshold
        assert abs(int(res.iterations) - k_o) <= 3, (int(res.iterations), k_o)

    def test_iteration_cap(self, rng):
        n = 64
        A = _spd(rng, n, cond=1e8).astype(np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        res = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
            jnp.zeros(n, jnp.float32), tol=1e-12, max_iter=10)
        assert int(res.iterations) == 11  # reference's k <= max_iter quirk

    def test_jacobi_preconditioner(self, rng):
        n = 128
        # Strongly diagonal-dominant but badly scaled system.
        d = np.geomspace(1, 1e6, n)
        A = (np.diag(d) + 0.01 * _spd(rng, n)).astype(np.float32)
        A = (A + A.T) / 2
        b = rng.standard_normal(n).astype(np.float32)
        diag = jnp.asarray(np.diag(A))
        plain = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
            jnp.zeros(n, jnp.float32), tol=1e-6, max_iter=2000)
        pcg = conjugate_gradient(
            lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
            jnp.zeros(n, jnp.float32), tol=1e-6, max_iter=2000,
            precond=lambda r: r / diag)
        assert int(pcg.iterations) < int(plain.iterations)
        x_want = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(pcg.x), x_want, rtol=1e-2, atol=1e-5)

    def test_pytree_state(self, rng):
        """CG over a pytree of two blocks (diag system per block)."""
        d1 = (rng.random(16).astype(np.float32) + 0.5)
        d2 = (rng.random(8).astype(np.float32) + 0.5)
        b = {"a": jnp.asarray(rng.standard_normal(16).astype(np.float32)),
             "b": jnp.asarray(rng.standard_normal(8).astype(np.float32))}
        mv = lambda v: {"a": jnp.asarray(d1) * v["a"], "b": jnp.asarray(d2) * v["b"]}
        x0 = {"a": jnp.zeros(16), "b": jnp.zeros(8)}
        res = conjugate_gradient(mv, b, x0, tol=1e-7, max_iter=200)
        np.testing.assert_allclose(np.asarray(res.x["a"]), np.asarray(b["a"]) / d1,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.x["b"]), np.asarray(b["b"]) / d2,
                                   rtol=1e-4)
