"""Batched multi-object solve via ``vmap`` (BASELINE.json config 4).

The reference is strictly one-solve-per-process; on TPU the whole outer
iteration is a pure function of (state, problem), so a stack of objects
(same image geometry) maps to one ``vmap``-ed program — the lighting GEMMs
become batched GEMMs, the CG stencils process all objects per pass.

Per-object stopping uses the standard batched-while pattern: all lanes run
until every lane's reference stopping rule has fired, with finished lanes
frozen by ``where`` — identical per-lane trajectories to solo runs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..models import srps


def stack_problems(problems) -> srps.SRPSProblem:
    """Stack equally-shaped SRPSProblem pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *problems)


def stack_states(states) -> srps.SRPSState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _unstack_all(tree, B: int):
    """Split a stacked pytree into B per-lane pytrees with ONE jitted
    program. A naive per-leaf ``x[i]`` in Python dispatches ~20*B tiny
    slice programs, each paying the dispatch channel's per-call latency —
    through the axon tunnel that measured 0.33 s/batch vs the 0.10 s the
    solves themselves take."""
    f = jax.jit(lambda t: tuple(
        jax.tree_util.tree_map(lambda x: x[i], t) for i in range(B)))
    return f(tree)


def solve_batched_streaming(states, probs, sf: int, cfg: SolverConfig):
    """Throughput batching on ONE chip: B asynchronous dispatches of the
    resident single-problem fused solve (``srps.solve_fused``), nothing
    forced to the host here — the caller's single result fetch (the LAST
    lane suffices: one device executes programs in dispatch order)
    overlaps every lane's dispatch latency with the previous lane's
    device work.

    Why this beats the lockstep kernel on a single chip: the lane-batched
    Pallas launch runs lanes SEQUENTIALLY over its grid (one TensorCore),
    so lockstep offers no cross-lane amortisation to pay for its vmapped
    glue — the per-iteration lane freeze (`where` over the full state) and
    the all-lanes-run-until-the-last-stops outer loop. Measured round 4:
    lockstep B=4 28.9 solves/s vs 41.2 single-stream sustained on the same
    geometry (BENCH_r04.json); streaming IS the single-stream program per
    lane, so it matches the sustained rate by construction and each lane's
    trajectory is bit-identical to its solo solve.

    When lockstep (:func:`solve_batched`) still wins: ONE program launch
    for the whole batch (mixed-geometry serving latency through a
    high-RTT dispatch channel) and the data-parallel multi-chip form
    (lanes sharded over a mesh — see ``parallel/sharded.py``), where the
    lanes really do run concurrently.

    ``states``/``probs``: per-lane SEQUENCES (preferred — zero unstack
    cost) or stacked pytrees (split by one jitted program). Returns
    (list of final states, list of energy traces), one entry per lane.
    """
    if isinstance(states, srps.SRPSState):
        B = states.z.shape[0]
        states = _unstack_all(states, B)
        probs = _unstack_all(probs, B)
    fused = _jit_solve_fused()
    results = [fused(st, pb, sf, cfg) for st, pb in zip(states, probs)]
    return [r[0] for r in results], [r[1] for r in results]


def _jit_solve_fused():
    # Reuse the runtime's jitted fused solve so serve/CLI/bench share one
    # compile-cache entry per geometry.
    from ..runtime.solver import _jit_solve_fused as f

    return f


def resolve_batch_mode(mode: str = "auto") -> str:
    """"auto" = stream on a single-device backend (throughput optimum),
    lockstep when multiple devices are visible (the lane-sharded DP form
    needs one program over all lanes)."""
    if mode == "auto":
        return "stream" if jax.device_count() == 1 else "lockstep"
    if mode in ("stream", "lockstep"):
        return mode
    raise ValueError(f"unknown batch mode {mode!r}")


def solve_batch(states, probs, sf: int, cfg: SolverConfig,
                mode: str = "auto"):
    """Route a batch to the right execution form (see
    :func:`resolve_batch_mode`). ``states``/``probs``: per-lane sequences
    or stacked pytrees. Returns (list of final states, list of traces) —
    lockstep results are split back to lanes for a uniform contract."""
    mode = resolve_batch_mode(mode)
    if mode == "stream":
        return solve_batched_streaming(states, probs, sf, cfg)
    if not isinstance(states, srps.SRPSState):
        states = stack_states(list(states))
        probs = stack_problems(list(probs))
    final, trace = solve_batched(states, probs, sf, cfg)
    B = final.z.shape[0]
    finals = _unstack_all(final, B)
    return list(finals), [trace[b] for b in range(B)]


def _iteration_batched_pallas(states, probs, sf: int, cfg: SolverConfig):
    """One outer iteration for a stacked batch, with the depth CG running
    as ONE lane-batched Pallas launch (vmap of the manual-DMA kernel is
    unsupported on TPU; everything else vmaps as plain jnp)."""
    from ..ops import gradients as gradops
    from ..ops.normals import normals_from_depth
    from ..solve import pallas_cg_cgs as _cgs
    from ..solve import pallas_cg_vmem as _pvm
    from ..solve.pallas_cg_pipe import cg_pallas_pipelined_fromop_batched

    lam = cfg.lam
    # Lighting and moments are called batch-aware, NOT vmapped: their big
    # image-stack dots merge (B, c) into one batch axis internally —
    # vmapping them instead makes XLA relayout the whole stacked I
    # (2 x B x 295 MB of copies per outer iteration; see the HLO-census
    # note in srps.estimate_lighting / tools/dump_hlo_batched.py).
    s = srps.estimate_lighting(probs, states.rho, states.N, states.s)
    mom = srps.s_moments(probs, s)
    rho = jax.vmap(srps.estimate_albedo)(probs, mom, states.N, states.rho)
    op = jax.vmap(lambda p, m, r, d: srps.build_depth_operator(p, m, r, d, lam)
                  )(probs, mom, rho, states.dz)
    # In-kernel r0 prologue: no host-side rhs/matvec passes, and the
    # precomputed probs.ktw / probs.z0t fields avoid the per-iteration
    # upsample relayouts (same as the single-problem path).
    h, w = states.z.shape[-2:]
    # VMEM-resident kernel when one lane's whole CG state fits on-chip
    # (lanes run sequentially over the launch grid, so the gate is
    # per-lane); it avoids the per-iteration HBM streaming AND the
    # chained-launch glue (measured 35 vs 93 us/CG-iter in-context).
    use_vmem = (cfg.pallas_vmem_resident and _pvm.supported_vmem(
        h, w, sf, jacobi=cfg.jacobi_preconditioner))
    # The VMEM kernel's epilogue evaluates the per-lane quadratic energy
    # partial in one resident sweep (see srps.estimate_depth) — skips the
    # vmapped XLA energy pass below.
    kern_e = use_vmem and cfg.kernel_energy
    e_part = None
    if cfg.jacobi_preconditioner:
        invd = 1.0 / jax.vmap(
            lambda o, p: srps.depth_diag(o, p, sf, lam))(op, probs)
        cg_fn = (_pvm.cg_pallas_vmem_fromop_batched if use_vmem
                 else cg_pallas_pipelined_fromop_batched)
        x, cg_iters, _, *e_tail = cg_fn(
            states.z, op, probs.gm, probs.ktw, probs.z0t, sf=sf, lam=lam,
            tol=cfg.cg_tol, max_iter=cfg.cg_max_iter, invd=invd,
            **({"with_energy": True, "z0u": probs.z0up} if kern_e else {}))
    else:
        cg_fn = (_pvm.cg_pallas_vmem_fromop_batched if use_vmem
                 else cg_pallas_pipelined_fromop_batched)
        if (cfg.pallas_cg_variant == "cgs" and _cgs.supported_cgs(h, w, sf)):
            cg_fn = _cgs.cg_pallas_cgs_batched
            kern_e = False
        x, cg_iters, _, *e_tail = cg_fn(
            states.z, op, probs.gm, probs.ktw, probs.z0t, sf=sf, lam=lam,
            tol=cfg.cg_tol, max_iter=cfg.cg_max_iter,
            **({"with_energy": True, "z0u": probs.z0up} if kern_e else {}))
    if kern_e:
        e_part = e_tail[0]
    z = x * probs.mask
    if e_part is not None:
        energy = e_part + lam * jnp.asarray(op.const)
    else:
        energy = jax.vmap(lambda zz, o, p: srps.depth_energy(
            zz, o, p, sf, lam))(z, op, probs)
    zx = jax.vmap(gradops.grad_x)(z, probs.gm)
    zy = jax.vmap(gradops.grad_y)(z, probs.gm)
    N, dz = jax.vmap(normals_from_depth)(z, zx, zy, probs.xx, probs.yy,
                                         probs.mask, probs.fx, probs.fy)
    return srps.SRPSState(
        z=z, rho=rho, s=s, N=N, dz=dz, energy=energy,
        last_energy=states.energy, iteration=states.iteration + 1,
        cg_iters=cg_iters)


@partial(jax.jit, static_argnames=("sf", "cfg"))
def solve_batched(
    states: srps.SRPSState,
    probs: srps.SRPSProblem,
    sf: int,
    cfg: SolverConfig,
) -> Tuple[srps.SRPSState, jax.Array]:
    """Solve B problems in lockstep. Returns (final_states, energy_trace)
    with trace shape (B, max_iterations + 2).

    With cfg.use_pallas the depth CG of all lanes runs as one lane-batched
    Pallas launch per outer iteration; otherwise the whole iteration is
    vmap'ed jnp."""
    from ..solve import pallas_cg as _pcg

    h, w = states.z.shape[-2:]
    # Same VMEM/width gate estimate_depth applies: unsupported grids (e.g.
    # 1920-wide at the pipelined kernel's double-buffered footprint) fall
    # back to the vmap'ed jnp iteration instead of failing Mosaic compile.
    # Jacobi rides the pipelined fromop kernel (invd as a packed F row);
    # the cgs variant has no preconditioned kernel, so jacobi+cgs falls
    # back to the vmapped jnp PCG.
    from ..solve.pallas_cg_vmem import supported_vmem

    if (cfg.use_pallas
            and not (cfg.jacobi_preconditioner
                     and cfg.pallas_cg_variant == "cgs")
            and (_pcg.supported(h, w, sf, pipelined=True,
                                jacobi=cfg.jacobi_preconditioner)
                 or (cfg.pallas_vmem_resident and supported_vmem(
                     h, w, sf, jacobi=cfg.jacobi_preconditioner)))):
        iterate = lambda st, pb: _iteration_batched_pallas(st, pb, sf, cfg)
    else:
        iterate = jax.vmap(lambda st, pb: srps.srps_iteration(st, pb, sf, cfg))
    stop_fn = jax.vmap(lambda st: srps.should_stop(st, cfg))
    trace_len = cfg.max_iterations + 2

    def cond(carry):
        states, stopped, trace, it = carry
        return (~jnp.all(stopped)) & (it < trace_len)

    def body(carry):
        states, stopped, trace, it = carry
        new_states = iterate(states, probs)
        # Freeze lanes that already stopped (keep their final state).
        merged = jax.tree_util.tree_map(
            lambda old, new: jnp.where(
                stopped.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
            ),
            states,
            new_states,
        )
        trace = trace.at[:, it].set(
            jnp.where(stopped, trace[:, it], merged.energy)
        )
        stopped = stopped | stop_fn(merged)
        return merged, stopped, trace, it + 1

    B = states.z.shape[0]
    trace0 = jnp.full((B, trace_len), jnp.nan, jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    final, stopped, trace, _ = jax.lax.while_loop(
        cond, body, (states, stopped0, trace0, jnp.int32(0))
    )
    return final, trace
