"""Bisect the in-loop kernel slowdown. All cells measured in ONE process
(chip state drifts between runs). Marginal between caps 100 and 300.

Cells:
  alone    separate jitted dispatches of the fromop wrapper
  chain    fori_loop chaining the wrapper (re-packs T/F/R0 every call)
  rawchain fori_loop over the RAW pallas_call with prebuilt T/F/R0 carried
           through the loop (no per-call packing at all)
"""

from __future__ import annotations

import functools
import sys
import time

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402
from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg  # noqa: E402
from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (  # noqa: E402
    _kernel, cg_pallas_pipelined_fromop, stack_fields_packed)

LO, HI = 100, 300


def best(f, reps=4):
    np.asarray(jnp.sum(f()))
    b = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(f()))
        b = min(b, time.perf_counter() - t0)
    return b


def raw_call(consts, T, F, R0, *, sf, lam, geo, max_iter):
    kernel = functools.partial(_kernel, lam=lam, sf=sf,
                               n_bands=geo.n_bands, th=geo.th, fromop=True)
    T_new, iters, r1, _ = pl.pallas_call(
        kernel,
        grid=(1, max_iter + 2, 2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct(T.shape, T.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=40 << 20),
    )(consts, T, F, R0)
    return T_new, r1


def main():
    ds = find_dataset()
    from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

    data = load_image_dataset(ds) if ds else synthetic_dataset()
    cfg = SolverConfig(use_pallas=True)
    sf = int(data.sf)
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
    jax.block_until_ready(op)
    h, w = st.z.shape
    th = _pcg.pick_th(h, w, pipelined=True)
    geo = _pcg.geometry(h, w, th)

    # Prebuilt padded operands for the raw cells.
    F1 = stack_fields_packed(op, prob.gm, prob.ktw, geo)[None]
    R01 = _pcg.pad_field(
        jnp.stack([op.QB1, op.QB2, op.QB3, prob.z0t]), geo)[None]
    T1 = jnp.stack([_pcg.pad_field(jnp.asarray(st.z), geo)]
                   + [jnp.zeros(geo.shape, jnp.float32)] * 4)[None]
    consts = jnp.array([[1e-30 ** 2, 0.0, 1.0]], jnp.float32)
    jax.block_until_ready((F1, R01, T1))

    res = {}
    for cap in (LO, HI):
        cs = consts.at[0, 2].set(float(cap))

        # alone: separate dispatches of the wrapper
        f_alone = jax.jit(functools.partial(
            cg_pallas_pipelined_fromop, sf=sf, lam=cfg.lam, tol=1e-30,
            max_iter=cap))
        res[("alone", cap)] = best(
            lambda: f_alone(st.z, op, prob.gm, prob.ktw, prob.z0t)[0])

        # chain: fori over the wrapper (per-call pack)
        def chain(n, z, e, mi=cap):
            def body(i, zc):
                return cg_pallas_pipelined_fromop(
                    zc, e["op"], e["prob"].gm, e["prob"].ktw,
                    e["prob"].z0t, sf=sf, lam=cfg.lam, tol=1e-30,
                    max_iter=mi)[0]
            return lax.fori_loop(0, n, body, z)

        f_chain = jax.jit(chain, static_argnums=0)
        env = dict(op=op, prob=prob)
        t4 = best(lambda: f_chain(4, st.z, env))
        t1 = best(lambda: f_chain(1, st.z, env))
        res[("chain", cap)] = (t4 - t1) / 3

        # rawchain: fori over the raw call, T carried (no packing)
        def rawchain(n, T, F, R0, cs, mi=cap):
            def body(i, Tc):
                T_new, r1 = raw_call(cs, Tc, F, R0, sf=sf, lam=cfg.lam,
                                     geo=geo, max_iter=mi)
                return T_new
            return lax.fori_loop(0, n, body, T)

        f_raw = jax.jit(rawchain, static_argnums=0)
        t4 = best(lambda: f_raw(4, T1, F1, R01, cs))
        t1 = best(lambda: f_raw(1, T1, F1, R01, cs))
        res[("rawchain", cap)] = (t4 - t1) / 3
        # raw1: ONE execution inside fori_loop(0,1) — if this already runs
        # at the chained rate, the slowdown is loop-compilation, not
        # inter-iteration memory state.
        res[("raw1", cap)] = t1

        # scan2: two back-to-back raw calls per fori body — halves any
        # per-loop-iteration boundary cost relative to rawchain.
        def rawchain2(n, T, F, R0, cs, mi=cap):
            def body(i, Tc):
                Ta, _ = raw_call(cs, Tc, F, R0, sf=sf, lam=cfg.lam,
                                 geo=geo, max_iter=mi)
                Tb, _ = raw_call(cs, Ta, F, R0, sf=sf, lam=cfg.lam,
                                 geo=geo, max_iter=mi)
                return Tb
            return lax.fori_loop(0, n, body, T)

        f_raw2 = jax.jit(rawchain2, static_argnums=0)
        t2 = best(lambda: f_raw2(2, T1, F1, R01, cs))
        t1b = best(lambda: f_raw2(1, T1, F1, R01, cs))
        res[("rawchain2", cap)] = (t2 - t1b) / 2

    for name in ("alone", "chain", "rawchain", "raw1", "rawchain2"):
        per = (res[(name, HI)] - res[(name, LO)]) / (HI - LO)
        print(f"{name:<9} {per * 1e6:8.1f} us/iter  "
              f"(t{LO}={res[(name, LO)] * 1e3:.1f} ms, "
              f"t{HI}={res[(name, HI)] * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
