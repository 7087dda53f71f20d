"""Outer-loop driver: alternation, stopping rule, metrics, dumps, resume.

Mirrors the control flow of ``SRPS::execute`` (SRPS.cu:84-370) with two
execution modes:

* **stepwise** (default): one jitted outer iteration per Python step —
  reference-equivalent behaviour with per-iteration timings, energy,
  relative error, and optional MAT/npz dumps + PNG snapshots.
* **fused**: the entire solve inside one on-device ``lax.while_loop``
  (zero host round-trips; the energy trace comes back at the end). Used
  by the benchmark path.
"""

from __future__ import annotations

import json
import time
from functools import partial
from typing import Optional

import jax
import numpy as np

from ..config import RuntimeConfig, SolverConfig
from ..io import writers
from ..io.image_loader import ProblemData
from ..models import srps
from ..pre import preprocess_depth


class Timer:
    """Wall-clock phase timer mirroring the reference Timer (Utilities.h:
    194-222): ``end`` blocks on device completion before reading the clock."""

    def __init__(self):
        self.t0 = 0.0
        self.elapsed = 0.0

    def start(self):
        self.t0 = time.perf_counter()
        return self

    def end(self, *block_on):
        for x in block_on:
            # jax.block_until_ready does not block reliably through the
            # axon TPU tunnel (CLAUDE.md); a host transfer of one element
            # does — it cannot complete until the producing computation has.
            leaves = jax.tree_util.tree_leaves(x)
            for leaf in leaves:
                np.asarray(jax.numpy.ravel(leaf)[:1])
        self.elapsed = time.perf_counter() - self.t0
        return self.elapsed


def prepare(data: ProblemData, cfg: SolverConfig = SolverConfig()):
    """Device-side setup: preprocessing + problem/state construction
    (SRPS.cu:100-270)."""
    h, w = data.mask.shape
    zs, z_init = preprocess_depth(data.z0, h, w, cfg)
    prob = srps.build_problem(data.I, data.mask, data.K, data.sf, zs * 0.0,
                              image_dtype=cfg.image_dtype)
    # z0s is the masked smoothed LR depth (SRPS.cu:236-239).
    prob = prob._replace(z0s=jax.numpy.asarray(zs) * prob.masks)
    state = srps.init_state(prob, z_init)
    return prob, state


@partial(jax.jit, static_argnames=("sf", "cfg"))
def _jit_iteration(state, prob, sf, cfg):
    return srps.srps_iteration(state, prob, sf, cfg)


@partial(jax.jit, static_argnames=("sf", "cfg"))
def _jit_solve_fused(state, prob, sf, cfg):
    return srps.solve_fused(state, prob, sf, cfg)


def solve(
    data: ProblemData,
    cfg: SolverConfig = SolverConfig(),
    rt: RuntimeConfig = RuntimeConfig(),
    verbose: bool = True,
):
    """End-to-end solve. Returns (final_state, metrics: list of dicts)."""
    if rt.nan_check:
        jax.config.update("jax_debug_nans", True)
    profiler_cm = None
    if rt.profile_dir:
        profiler_cm = jax.profiler.trace(rt.profile_dir)
        profiler_cm.__enter__()
    try:
        return _solve_inner(data, cfg, rt, verbose)
    finally:
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)
        if rt.nan_check:
            jax.config.update("jax_debug_nans", False)


def _solve_inner(data, cfg, rt, verbose):
    prob, state = prepare(data, cfg)
    sf = int(data.sf)

    if rt.resume_from:
        ck = writers.load_checkpoint(rt.resume_from)
        state = srps.SRPSState(
            z=jax.numpy.asarray(ck["z"]),
            rho=jax.numpy.asarray(ck["rho"]),
            s=jax.numpy.asarray(ck["s"]),
            N=jax.numpy.asarray(ck["N"]),
            dz=jax.numpy.asarray(ck["dz"]),
            energy=jax.numpy.asarray(ck["energy"]),
            last_energy=jax.numpy.asarray(ck["last_energy"]),
            iteration=jax.numpy.asarray(int(ck["iteration"]), jax.numpy.int32),
            cg_iters=jax.numpy.asarray(0, jax.numpy.int32),
        )

    metrics = []

    if rt.fused_outer_loop:
        t = Timer().start()
        final, trace = _jit_solve_fused(state, prob, sf, cfg)
        dt = t.end(final.z)
        trace = np.asarray(trace)
        n_it = int(final.iteration)
        for i in range(n_it):
            metrics.append({"iteration": i + 1, "energy": float(trace[i])})
        metrics.append({"total_seconds": dt, "iterations": n_it})
        if verbose:
            print(f"fused solve: {n_it} iterations in {dt:.3f}s, "
                  f"final energy {float(final.energy):.3f}")
        _write_outputs(final, prob, rt, metrics)
        return final, metrics

    last_error = float(state.energy) if rt.resume_from else float("nan")
    iteration = int(state.iteration) + 1
    while True:
        t = Timer().start()
        state = _jit_iteration(state, prob, sf, cfg)
        dt = t.end(state.z)
        error = float(state.energy)
        rel_err = abs(last_error - error) / abs(error)
        rec = {
            "iteration": iteration,
            "energy": error,
            "relative_error": rel_err,
            "cg_iterations": int(state.cg_iters),
            "seconds": dt,
        }
        metrics.append(rec)
        if verbose:
            # Reference prints per-phase timers + an iteration summary
            # (SRPS.cu:283-305); phases here are fused into one XLA program,
            # so one wall time covers lighting+albedo+depth.
            print(f"\nIteration {iteration:02d} summary")
            print(f"{'Error':<25}: {error:<6.3f}")
            print(f"{'Relative Error':<25}: {rel_err:<6.3f}")
            print(f"{'Iteration time':<25}: {dt:<6.6f}s "
                  f"(CG iters: {int(state.cg_iters)})")
        if rt.dump_iterations:
            writers.dump_state(rt.dump_dir, state, np.asarray(prob.mask),
                               fmt=rt.dump_format)
            writers.save_checkpoint(
                f"{rt.dump_dir}/checkpoint.npz", state, iteration)
        if rt.save_visualizations:
            writers.save_visualizations(rt.dump_dir, state,
                                        np.asarray(prob.mask), tag=f"_{iteration:02d}")
        # Stopping rule — exact reference semantics (SRPS.cu:297-301).
        stop = (error > last_error) or (rel_err < cfg.tolerance) or (
            iteration > cfg.max_iterations)
        last_error = error
        iteration += 1
        if stop:
            break

    _write_outputs(state, prob, rt, metrics)
    return state, metrics


def _write_outputs(state, prob, rt: RuntimeConfig, metrics):
    if rt.metrics_jsonl:
        with open(rt.metrics_jsonl, "w") as f:
            for rec in metrics:
                f.write(json.dumps(rec) + "\n")
    if rt.dump_iterations or rt.save_visualizations:
        mask = np.asarray(prob.mask)
        if rt.dump_iterations:
            writers.dump_state(rt.dump_dir, state, mask, fmt=rt.dump_format,
                               tag="_final")
        if rt.save_visualizations:
            writers.save_visualizations(rt.dump_dir, state, mask, tag="_final")
