"""Grid-sharded solve over a TPU mesh (BASELINE.json config 5).

The scaling axis of this workload is *pixels* (SURVEY.md section 5): the
masked HR grid is partitioned over a device mesh with axes

  ('data', 'x', 'y'):  data = object batch (DP), x/y = spatial grid (the
                       SP/CP analog for an image-grid workload).

All model code is pure dense-grid math, so sharding is expressed entirely
through ``NamedSharding`` annotations under ``jit`` — the XLA SPMD
partitioner inserts the halo exchanges for the +/-1-pixel gradient
stencils and the ``psum``-style reductions for the CG dot products over
ICI automatically; no communication code appears in the model. (A manual
``shard_map`` + ``ppermute`` halo pipeline is a planned alternative for
when the compiler's choices need overriding.)

Sharding layout:
  I (n, c, h, w)      -> P(None, None, 'x', 'y')
  mask/z/rho/N fields -> P(..., 'x', 'y') on the trailing two dims
  s (n, c, 4), Grams  -> replicated
  LR fields (h/sf, ..)-> P('x', 'y')  (tile-aligned: shard sizes are kept
                         multiples of sf so box-resampling never crosses
                         shard boundaries)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..models import srps


def make_mesh(n_devices: Optional[int] = None, data: int = 1) -> Mesh:
    """Build a ('data', 'x', 'y') mesh from the available devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    spatial = n_devices // data
    # Split the spatial factor as squarely as possible.
    x = 1
    for f in range(int(np.sqrt(spatial)), 0, -1):
        if spatial % f == 0:
            x = f
            break
    y = spatial // x
    arr = np.array(devs).reshape(data, x, y)
    return Mesh(arr, ("data", "x", "y"))


def _spec_for(leaf, mesh: Mesh, batched: bool) -> P:
    """Trailing-2-dims spatial sharding; leading batch dim -> 'data'."""
    nd = leaf.ndim
    spec = [None] * nd
    if nd >= 2:
        spec[-2] = "x"
        spec[-1] = "y"
    if batched and nd >= 3:
        spec[0] = "data"
    return P(*spec)


def _small_leaves(leaf) -> bool:
    # s (n,c,4), Gram matrices, scalars: replicate.
    return leaf.ndim < 2 or leaf.shape[-1] < 8


def shard_pytree(tree, mesh: Mesh, batched: bool = False):
    """Apply NamedShardings to every leaf of a problem/state pytree."""

    def place(leaf):
        leaf = jnp.asarray(leaf)
        if _small_leaves(leaf):
            spec = P("data") if (batched and leaf.ndim >= 1) else P()
        else:
            spec = _spec_for(leaf, mesh, batched)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def solve_sharded(
    state: srps.SRPSState,
    prob: srps.SRPSProblem,
    sf: int,
    cfg: SolverConfig,
    mesh: Mesh,
) -> Tuple[srps.SRPSState, jax.Array]:
    """Fused on-device solve with grid sharding. The inputs must already be
    placed with :func:`shard_pytree`; outputs keep their shardings."""
    fn = jax.jit(partial(srps.solve_fused, sf=sf, cfg=cfg))
    return fn(state, prob)


def step_sharded(state, prob, sf: int, cfg: SolverConfig):
    fn = jax.jit(partial(srps.srps_iteration, sf=sf, cfg=cfg))
    return fn(state, prob)


# ---------------------------------------------------------------------------
# Multi-chip dry run (driver hook)
# ---------------------------------------------------------------------------


def dryrun(n_devices: int, batch: Optional[int] = None) -> None:
    """Create an n-device mesh, jit the FULL solve step under real DP + SP
    shardings, and execute one step on tiny shapes."""
    from ..pre import preprocess_depth

    devs = jax.devices()
    assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
    if batch is None:
        batch = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(n_devices, data=batch)

    # Tiny problem sized so each spatial shard is a multiple of sf.
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    sf, n, c = 2, 2, 3
    h = max(16, 2 * sf * sx)
    w = max(16, 2 * sf * sy)
    h += (-h) % (sf * sx)
    w += (-w) % (sf * sy)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (0.45 * min(h, w)) ** 2
            ).astype(np.float32)
    K = [[300.0, 0, w / 2 - 0.5], [0, 300.0, h / 2 - 0.5], [0, 0, 1]]
    cfg = SolverConfig(max_iterations=2)

    probs, states = [], []
    for b in range(batch):
        I = rng.random((n, c, h, w)).astype(np.float32)
        z0 = (rng.random((n, h // sf, w // sf)).astype(np.float32) + 1.0) * 50.0
        zs, z_init = preprocess_depth(z0, h, w, cfg)
        pb = srps.build_problem(I, mask, K, sf, zs)
        probs.append(pb)
        states.append(srps.init_state(pb, z_init))

    from .batched import stack_problems, stack_states

    prob_b = stack_problems(probs)
    state_b = stack_states(states)
    prob_b = shard_pytree(prob_b, mesh, batched=True)
    state_b = shard_pytree(state_b, mesh, batched=True)

    step = jax.vmap(lambda st, pb: srps.srps_iteration(st, pb, sf, cfg))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        out = jax.jit(step)(state_b, prob_b)
        jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out.energy))), "non-finite energy"
