"""Interleaved hardware microbench: per-shard CGS sweep kernel with the
direct packed-F matvec vs the collapsed 9-point stencil sweep
(shard_pallas._cgs_sweep_kernel, stencil=False/True), Mitten-geometry
grid treated as ONE shard (the kernel is mesh-agnostic — shard_map only
adds the halo exchange + psum around it).

Marginal sweep-count differencing (100 vs 25 chained sweeps,
difference-of-bests, interleaved). Run ALONE on the chip:
    python tools/profile_shard_stencil.py
"""

from __future__ import annotations

import sys
import time

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from bench import find_dataset, synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402
from srmeetsps_cuda_tpu.parallel import shard_pallas as sp  # noqa: E402
from srmeetsps_cuda_tpu.solve import pallas_cg as pcg  # noqa: E402
from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import stack_fields_packed  # noqa: E402
from srmeetsps_cuda_tpu.solve.pallas_cg_vmem import (  # noqa: E402
    _build_c_band, stack_fields_rows)


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    cfg = SolverConfig(use_pallas=True)
    sf = int(data.sf)
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)
    np.asarray(st.z)
    lam = cfg.lam
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, lam)

    h, w = st.z.shape
    h_b = h  # whole grid = one shard
    th = sp.pick_th_shard(h_b, w)
    wp = -(-w // 128) * 128
    geo = sp._TailGeo(h_b, w, h_b, wp, th)
    print(f"grid {h}x{w}, th={th}, bands={geo.n_bands}")

    # Single-shard field packs: zero rings = the global boundary, no
    # exchange needed.
    ktw = pcg.make_ktw(prob.mask, prob.masks, sf)
    F = stack_fields_packed(op, prob.gm, ktw, geo)
    C = _build_c_band(stack_fields_rows(op, prob.gm, ktw, geo),
                      lam, sf, h_b)
    R0 = jnp.stack([pcg.pad_field(r, geo) for r in (
        op.QB1, op.QB2, op.QB3, jnp.asarray(prob.z0t, jnp.float32))])
    T0 = jnp.zeros((5,) + geo.shape, jnp.float32)
    T0 = T0.at[sp.TX].set(pcg.pad_field(jnp.asarray(st.z, jnp.float32),
                                        geo))
    T0, gd0 = sp._call_prologue(T0, F, R0, geo, lam, sf, h_b, with_w0=True)
    env = dict(T0=T0, F=F, C=C, gd0=gd0)
    jax.block_until_ready(env)

    def chain_for(stencil):
        def chain(k, e):
            Fld = e["C"] if stencil else e["F"]

            def body(i, carry):
                T_cur, T_alt, gd = carry
                # epsilon-tie beta/alpha to the carry so nothing hoists
                beta = jnp.float32(0.5) + 1e-38 * gd[0, 0]
                alpha = jnp.float32(0.01) + 1e-38 * gd[0, 1]
                T_new, gd_new = sp._call_cgs_sweep(
                    T_cur, T_alt, Fld, beta, alpha, geo, lam, sf, h_b,
                    stencil=stencil)
                return (T_new, T_cur, gd_new)

            T_fin, _, gd = lax.fori_loop(
                0, k, body, (e["T0"], jnp.zeros_like(e["T0"]), e["gd0"]))
            return gd

        return jax.jit(chain, static_argnums=(0,))

    fns = {False: chain_for(False), True: chain_for(True)}

    def timed(stencil, k):
        gd = fns[stencil](k, env)
        np.asarray(gd)
        t0 = time.perf_counter()
        gd = fns[stencil](k, env)
        np.asarray(gd)
        return time.perf_counter() - t0

    for stencil in fns:
        for k in (25, 100):
            timed(stencil, k)  # compile/warm

    best = {}
    for _ in range(10):
        for stencil in fns:
            for k in (25, 100):
                t = timed(stencil, k)
                best[(stencil, k)] = min(best.get((stencil, k), 1e9), t)

    for stencil in (False, True):
        per = (best[(stencil, 100)] - best[(stencil, 25)]) / 75.0
        name = "stencil" if stencil else "direct"
        print(f"{name:<8} {per * 1e6:7.2f} us/sweep")

    # agreement: one sweep from the same prologue state
    outs = {}
    for stencil in fns:
        gd = np.asarray(fns[stencil](5, env))
        outs[stencil] = gd
    d = np.abs(outs[True] - outs[False]).max()
    s = np.abs(outs[False]).max()
    print(f"(gamma, delta) after 5 sweeps: maxdiff {d:.3e} "
          f"(scale {s:.3e})")


if __name__ == "__main__":
    main()
