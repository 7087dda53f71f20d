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


@partial(jax.jit, static_argnames=("sf", "cfg"))
def solve_batched(
    states: srps.SRPSState,
    probs: srps.SRPSProblem,
    sf: int,
    cfg: SolverConfig,
) -> Tuple[srps.SRPSState, jax.Array]:
    """Solve B problems in lockstep. Returns (final_states, energy_trace)
    with trace shape (B, max_iterations + 2)."""
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
