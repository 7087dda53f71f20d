"""Hardware lane: compile + run every Pallas CG variant on the real TPU.

The main suite runs the kernels in interpret mode on a forced 8-CPU mesh
(tests/conftest.py), which validates semantics but would stay green across
a Mosaic/libtpu compile regression. This module is the counterpart: each
kernel variant is Mosaic-compiled and executed on the actual chip, checked
against the jnp CG at a short horizon.

Deselected by default (pyproject addopts `-m "not tpu"`); run standalone:

    python -m pytest -m tpu tests/test_tpu_hw.py -v

Must run in a fresh process (the fixture re-points jax_platforms away from
the conftest's CPU pin before the first backend touch; it skips cleanly if
a CPU backend is already initialised or no TPU is reachable).
"""

import functools

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    try:
        jax.config.update("jax_platforms", None)
        dev = jax.devices()[0]
    except Exception as e:  # backend pinned/initialised or no TPU
        pytest.skip(f"no TPU backend reachable: {e}")
    if dev.platform not in ("tpu", "axon") and "TPU" not in str(dev):
        pytest.skip(f"first device is not a TPU: {dev}")
    return dev


@pytest.fixture(scope="module")
def problem(tpu):
    import jax.numpy as jnp
    from conftest import random_mask
    from srmeetsps_cuda_tpu.models import srps

    rng = np.random.default_rng(0)
    h, w, sf, n, c = 64, 128, 2, 3, 3
    mask = random_mask(rng, h, w)
    I = rng.random((n, c, h, w)).astype(np.float32)
    K = [[300.0, 0, w / 2 - 0.5], [0, 300.0, h / 2 - 0.5], [0, 0, 1]]
    z0s = (rng.random((h // sf, w // sf)).astype(np.float32) + 0.5)
    prob = srps.build_problem(I, mask, K, sf, z0s)
    z = (rng.random((h, w)).astype(np.float32) + 0.5) * np.asarray(prob.mask)
    st = srps.init_state(prob, jnp.asarray(z))
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, 1.0)
    return prob, st, op, sf


def _ref(prob, st, op, sf, max_iter):
    import jax.numpy as jnp
    from srmeetsps_cuda_tpu.models import srps
    from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient

    mv = functools.partial(srps.depth_matvec, op=op, prob=prob, sf=sf,
                           lam=1.0)
    rhs = srps.depth_rhs(op, prob, sf, 1.0)
    b_res = rhs - mv(st.z)
    res = conjugate_gradient(mv, b_res, st.z, tol=1e-4, max_iter=max_iter)
    return b_res, res


def _check(x, k, res, rtol=1e-3):
    assert abs(int(k) - int(res.iterations)) <= 1
    xa = np.asarray(x)
    assert np.all(np.isfinite(xa))
    d = xa - np.asarray(res.x)
    rms = np.sqrt(np.mean(np.asarray(res.x) ** 2))
    assert np.sqrt(np.mean(d ** 2)) / rms < rtol


def test_two_call_kernel_on_hw(problem):
    from srmeetsps_cuda_tpu.solve.pallas_cg import cg_pallas, make_ktw

    prob, st, op, sf = problem
    b_res, res = _ref(prob, st, op, sf, 8)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    x, k, _ = cg_pallas(st.z, b_res, op, prob.gm, ktw, sf=sf, lam=1.0,
                        tol=1e-4, max_iter=8)
    _check(x, k, res)


def test_fused_kernel_on_hw(problem):
    from srmeetsps_cuda_tpu.solve.pallas_cg import make_ktw
    from srmeetsps_cuda_tpu.solve.pallas_cg_fused import cg_pallas_fused

    prob, st, op, sf = problem
    b_res, res = _ref(prob, st, op, sf, 8)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    x, k, _ = cg_pallas_fused(st.z, b_res, op, prob.gm, ktw, sf=sf, lam=1.0,
                              tol=1e-4, max_iter=8)
    _check(x, k, res)


def test_pipelined_kernel_on_hw(problem):
    from srmeetsps_cuda_tpu.solve.pallas_cg import make_ktw
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import cg_pallas_pipelined

    prob, st, op, sf = problem
    b_res, res = _ref(prob, st, op, sf, 8)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    x, k, _ = cg_pallas_pipelined(st.z, b_res, op, prob.gm, ktw, sf=sf,
                                  lam=1.0, tol=1e-4, max_iter=8)
    _check(x, k, res)


def test_fromop_prologue_on_hw(problem):
    from srmeetsps_cuda_tpu.ops import grid as gridops
    from srmeetsps_cuda_tpu.solve.pallas_cg import make_ktw
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
        cg_pallas_pipelined_fromop)

    prob, st, op, sf = problem
    _, res = _ref(prob, st, op, sf, 8)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    z0t = gridops.resample_masked_t(prob.z0s, prob.mask, prob.masks, sf)
    x, k, _ = cg_pallas_pipelined_fromop(st.z, op, prob.gm, ktw, z0t, sf=sf,
                                         lam=1.0, tol=1e-4, max_iter=8)
    _check(x, k, res)


def test_cgs_kernel_on_hw(problem):
    from srmeetsps_cuda_tpu.ops import grid as gridops
    from srmeetsps_cuda_tpu.solve.pallas_cg import make_ktw
    from srmeetsps_cuda_tpu.solve.pallas_cg_cgs import cg_pallas_cgs

    prob, st, op, sf = problem
    _, res = _ref(prob, st, op, sf, 8)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    z0t = gridops.resample_masked_t(prob.z0s, prob.mask, prob.masks, sf)
    x, k, _ = cg_pallas_cgs(st.z, op, prob.gm, ktw, z0t, sf=sf,
                            lam=1.0, tol=1e-4, max_iter=8)
    _check(x, k, res, rtol=5e-3)


def test_batched_pipelined_on_hw(problem):
    import jax
    import jax.numpy as jnp
    from srmeetsps_cuda_tpu.solve.pallas_cg import make_ktw
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
        cg_pallas_pipelined_batched)

    prob, st, op, sf = problem
    b_res, res = _ref(prob, st, op, sf, 8)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    stack2 = lambda a: jnp.stack([jnp.asarray(a)] * 2)
    xb, kb, _ = cg_pallas_pipelined_batched(
        stack2(st.z), stack2(b_res),
        jax.tree_util.tree_map(stack2, op),
        jax.tree_util.tree_map(stack2, prob.gm),
        stack2(ktw), sf=sf, lam=1.0, tol=1e-4, max_iter=8)
    for b in range(2):
        _check(xb[b], kb[b], res)


def test_jacobi_pipelined_on_hw(problem):
    from srmeetsps_cuda_tpu.models import srps
    from srmeetsps_cuda_tpu.ops import grid as gridops
    from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient
    from srmeetsps_cuda_tpu.solve.pallas_cg import make_ktw
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
        cg_pallas_pipelined_fromop)

    prob, st, op, sf = problem
    mv = functools.partial(srps.depth_matvec, op=op, prob=prob, sf=sf,
                          lam=1.0)
    rhs = srps.depth_rhs(op, prob, sf, 1.0)
    diag = srps.depth_diag(op, prob, sf, 1.0)
    res = conjugate_gradient(mv, rhs - mv(st.z), st.z, tol=1e-4,
                             max_iter=8, precond=lambda r: r / diag)
    ktw = make_ktw(prob.mask, prob.masks, sf)
    z0t = gridops.resample_masked_t(prob.z0s, prob.mask, prob.masks, sf)
    x, k, _ = cg_pallas_pipelined_fromop(
        st.z, op, prob.gm, ktw, z0t, sf=sf, lam=1.0, tol=1e-4, max_iter=8,
        invd=1.0 / diag)
    _check(x, k, res)


def test_vmem_resident_kernel_on_hw(problem):
    """Whole-solve-resident kernel (pallas_cg_vmem): Mosaic-compile and run
    the one-launch zero-HBM-loop variant, plain and Jacobi."""
    from srmeetsps_cuda_tpu.models import srps
    from srmeetsps_cuda_tpu.solve.cg import conjugate_gradient
    from srmeetsps_cuda_tpu.solve.pallas_cg_vmem import (
        cg_pallas_vmem_fromop, supported_vmem)

    prob, st, op, sf = problem
    h, w = np.asarray(prob.mask).shape
    assert supported_vmem(h, w, sf) and supported_vmem(h, w, sf, jacobi=True)
    _, res = _ref(prob, st, op, sf, 8)
    x, k, _, e_part = cg_pallas_vmem_fromop(
        st.z, op, prob.gm, prob.ktw, prob.z0t,
        sf=sf, lam=1.0, tol=1e-4, max_iter=8, with_energy=True,
        z0u=prob.z0up)
    _check(x, k, res)
    # The exactly-tracked in-kernel energy must reproduce depth_energy
    # at the returned iterate on real Mosaic too (the naive x'Mx - 2x'rhs
    # identity fails in f32 at real depth magnitudes — see _e0_band).
    e_kern = float(e_part + op.const)
    e_ref = float(srps.depth_energy(x * prob.mask, op, prob, sf, 1.0))
    np.testing.assert_allclose(e_kern, e_ref, rtol=1e-3)

    mv = functools.partial(srps.depth_matvec, op=op, prob=prob, sf=sf,
                           lam=1.0)
    diag = srps.depth_diag(op, prob, sf, 1.0)
    res_j = conjugate_gradient(mv, srps.depth_rhs(op, prob, sf, 1.0)
                               - mv(st.z), st.z, tol=1e-4, max_iter=8,
                               precond=lambda r: r / diag)
    x, k, _ = cg_pallas_vmem_fromop(st.z, op, prob.gm, prob.ktw, prob.z0t,
                                    sf=sf, lam=1.0, tol=1e-4, max_iter=8,
                                    invd=1.0 / diag)
    _check(x, k, res_j)


def test_vmem_full_mode_forced_on_hw(problem):
    """sf<=2 now routes to the 9-point stencil collapse ("full_stencil");
    force "full" so the direct mask-gated resident kernel (still the sf=4
    route) stays Mosaic-compile-covered on hardware."""
    from srmeetsps_cuda_tpu.solve import pallas_cg_vmem as pvm

    prob, st, op, sf = problem
    h, w = np.asarray(prob.mask).shape
    assert pvm.vmem_mode(h, w, sf, _check_backend=False) == "full_stencil"
    _, res = _ref(prob, st, op, sf, 8)
    real = pvm.vmem_mode
    try:
        pvm.vmem_mode = lambda *a, **k: "full"
        x, k, _ = pvm.cg_pallas_vmem_fromop(
            st.z, op, prob.gm, prob.ktw, prob.z0t, sf=sf, lam=1.0,
            tol=1e-4, max_iter=8)
    finally:
        pvm.vmem_mode = real
    _check(x, k, res)


def test_vmem_resident_batched_on_hw(problem):
    import jax
    import jax.numpy as jnp
    from srmeetsps_cuda_tpu.solve.pallas_cg_vmem import (
        cg_pallas_vmem_fromop_batched)

    prob, st, op, sf = problem
    _, res = _ref(prob, st, op, sf, 8)
    stack2 = lambda a: jnp.stack([jnp.asarray(a)] * 2)
    xb, kb, _ = cg_pallas_vmem_fromop_batched(
        stack2(st.z),
        jax.tree_util.tree_map(stack2, op),
        jax.tree_util.tree_map(stack2, prob.gm),
        stack2(prob.ktw), stack2(prob.z0t),
        sf=sf, lam=1.0, tol=1e-4, max_iter=8)
    for b in range(2):
        _check(xb[b], kb[b], res)


@pytest.mark.parametrize("variant", ["std", "cgs"])
def test_shard_pallas_kernels_on_hw(problem, variant):
    """Mosaic-compile the gen-2 per-shard kernels (prologue + sweep /
    phase pair) on the chip via a 1-device mesh, tail-band geometry
    included (h=64, th=64 -> single band; the tail path is covered by the
    interpret suite)."""
    import jax
    from jax.sharding import Mesh
    from srmeetsps_cuda_tpu.parallel import shard_pallas

    prob, st, op, sf = problem
    _, res = _ref(prob, st, op, sf, 8)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    fn = (shard_pallas.cg_sharded_pallas_cgs if variant == "cgs"
          else shard_pallas.cg_sharded_pallas_std)
    x, k, _ = fn(mesh, "x", st.z, op, prob.gm, prob.mask, prob.masks,
                 prob.z0t, sf=sf, lam=1.0, tol=1e-4, max_iter=8)
    _check(x, k, res, rtol=5e-3)
