"""Why does the kernel slow down inside a lax loop? Cells:

  inline2   two back-to-back raw calls in ONE jit, NO loop (marginal of
            2nd call): if slow -> program context, not loops
  loop_v24 / loop_v32 / loop_v48   rawchain with different
            vmem_limit_bytes: if rate tracks the limit -> VMEM pressure
  loop_nose rawchain with has_side_effects=False and r1 SMEM out kept
  scan      lax.scan instead of fori_loop
  donate    standalone dispatch with T donated (buffer reuse baseline)
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
    _kernel, stack_fields_packed)

LO, HI = 100, 300


def best(f, reps=4):
    np.asarray(jnp.sum(f()))
    b = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(f()))
        b = min(b, time.perf_counter() - t0)
    return b


def make_raw(sf, lam, geo, vmem_mb=40, side_effects=True):
    def raw_call(consts, T, F, R0, *, max_iter):
        kernel = functools.partial(_kernel, lam=lam, sf=sf,
                                   n_bands=geo.n_bands, th=geo.th,
                                   fromop=True)
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
                has_side_effects=side_effects,
                vmem_limit_bytes=vmem_mb << 20),
        )(consts, T, F, R0)
        return T_new, r1
    return raw_call


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

        # inline2: two back-to-back calls, no loop. marginal of the 2nd.
        raw = make_raw(sf, cfg.lam, geo)

        def inline1(T, F, R0, cs, mi=cap):
            Ta, _ = raw(cs, T, F, R0, max_iter=mi)
            return Ta

        def inline2(T, F, R0, cs, mi=cap):
            Ta, _ = raw(cs, T, F, R0, max_iter=mi)
            Tb, _ = raw(cs, Ta, F, R0, max_iter=mi)
            return Tb

        f1 = jax.jit(inline1)
        f2 = jax.jit(inline2)
        t1 = best(lambda: f1(T1, F1, R01, cs))
        t2 = best(lambda: f2(T1, F1, R01, cs))
        res[("inline2", cap)] = t2 - t1

        # loops with varying vmem limits
        for mb in (48, 64):
            rawv = make_raw(sf, cfg.lam, geo, vmem_mb=mb)

            def loopf(n, T, F, R0, cs, mi=cap, rv=rawv):
                def body(i, Tc):
                    return rv(cs, Tc, F, R0, max_iter=mi)[0]
                return lax.fori_loop(0, n, body, T)

            fl = jax.jit(loopf, static_argnums=0)
            t4 = best(lambda: fl(4, T1, F1, R01, cs))
            t1b = best(lambda: fl(1, T1, F1, R01, cs))
            res[(f"loop_v{mb}", cap)] = (t4 - t1b) / 3

        # loop without side effects
        rawn = make_raw(sf, cfg.lam, geo, side_effects=False)

        def loopn(n, T, F, R0, cs, mi=cap):
            def body(i, Tc):
                Tn, r1 = rawn(cs, Tc, F, R0, max_iter=mi)
                return Tn + 0.0 * r1[0, 0]
            return lax.fori_loop(0, n, body, T)

        fn = jax.jit(loopn, static_argnums=0)
        t4 = best(lambda: fn(4, T1, F1, R01, cs))
        t1b = best(lambda: fn(1, T1, F1, R01, cs))
        res[("loop_nose", cap)] = (t4 - t1b) / 3

        # scan instead of fori
        def scanf(T, F, R0, cs, mi=cap):
            def body(Tc, _):
                return raw(cs, Tc, F, R0, max_iter=mi)[0], ()
            Tn, _ = lax.scan(body, T, None, length=4)
            return Tn

        def scanf1(T, F, R0, cs, mi=cap):
            def body(Tc, _):
                return raw(cs, Tc, F, R0, max_iter=mi)[0], ()
            Tn, _ = lax.scan(body, T, None, length=1)
            return Tn

        fs4 = jax.jit(scanf)
        fs1 = jax.jit(scanf1)
        t4 = best(lambda: fs4(T1, F1, R01, cs))
        t1b = best(lambda: fs1(T1, F1, R01, cs))
        res[("scan", cap)] = (t4 - t1b) / 3

        # donated standalone dispatch
        fd = jax.jit(inline1, donate_argnums=0)
        res[("donate", cap)] = best(lambda: fd(T1 + 0.0, F1, R01, cs))

    names = ["inline2", "loop_v48", "loop_v64", "loop_nose", "scan",
             "donate"]
    for name in names:
        per = (res[(name, HI)] - res[(name, LO)]) / (HI - LO)
        print(f"{name:<10} {per * 1e6:8.1f} us/iter  "
              f"(t{LO}={res[(name, LO)] * 1e3:.1f} ms, "
              f"t{HI}={res[(name, HI)] * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
