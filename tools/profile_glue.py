"""Fine-grained glue decomposition on the real TPU (run ALONE on the chip).

Each component is its own small chained program (avoids the remote-compile
request-size limit) with a loop-carried dependency so XLA cannot hoist the
body. Chained-marginal timing per CLAUDE.md.
"""

from __future__ import annotations

import sys
import time

sys.stdout.reconfigure(line_buffering=True)
from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, "/root/repo")

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def marginal(f, n_lo=1, n_hi=9, reps=4):
    out = {}
    for n in (n_lo, n_hi):
        np.asarray(jnp.sum(f(n)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(f(n)))
            best = min(best, time.perf_counter() - t0)
        out[n] = best
    return (out[n_hi] - out[n_lo]) / (n_hi - n_lo)


def main():
    which = set(sys.argv[1:]) or None
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
    mom = srps.s_moments(prob, st.s)
    op = srps.build_depth_operator(prob, mom, st.rho, st.dz, cfg.lam)
    jax.block_until_ready((mom, op))

    # Everything the bodies touch rides as a jit ARGUMENT: closed-over
    # device arrays are embedded as HLO literals and blow the axon
    # remote-compile request-size limit (HTTP 413) on the 295 MB image
    # stack.
    env = dict(prob=prob, st=st, mom=mom, op=op)

    def run(name, body0, carry0):
        if which and name not in which:
            return

        def loop(n, carry, env):
            return lax.fori_loop(0, n, lambda i, c: body0(c, env), carry)

        f = jax.jit(loop, static_argnums=0)
        sel = lambda c: jax.tree_util.tree_leaves(c)[0]
        ms = marginal(lambda n: sel(f(n, carry0, env))) * 1e3
        print(f"{name:<16} {ms:8.3f} ms/iter")

    eps = jnp.float32(1e-30)

    # 1. lighting (ATA + T + ATb + batched solve)
    run("lighting",
        lambda rho, e: rho + eps * jnp.sum(
            srps.estimate_lighting(e["prob"], rho, e["st"].N, e["st"].s)),
        st.rho)

    # 2. s_moments (G + J matmul + reshape)
    def mom_body(s, e):
        m = srps.s_moments(e["prob"], s)
        return s + eps * (jnp.sum(m.G) + m.J[0, 0, 0])
    run("moments", mom_body, st.s)

    # 3. albedo (flat-unrolled sums)
    run("albedo",
        lambda rho, e: srps.estimate_albedo(e["prob"], e["mom"], e["st"].N,
                                            rho),
        st.rho)

    # 4. operator build (P/QB fields + const)
    def op_body(rho, e):
        o = srps.build_depth_operator(e["prob"], e["mom"], rho,
                                      e["st"].dz, cfg.lam)
        return rho + eps * (o.P11[0, 0] + o.QB3[0, 0] + o.const)
    run("opbuild", op_body, st.rho)

    # 5. pack (F stack + R0 pad + T stack) from a FIXED op
    from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg
    from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import stack_fields_packed

    h, w = st.z.shape
    th = _pcg.pick_th(h, w, pipelined=True)
    geo = _pcg.geometry(h, w, th)

    def pack_body(z, e):
        pr, o = e["prob"], e["op"]
        F = stack_fields_packed(o, pr.gm, pr.ktw, geo)
        R0 = _pcg.pad_field(
            jnp.stack([o.QB1, o.QB2, o.QB3, pr.z0t]), geo)
        T = jnp.stack([_pcg.pad_field(z, geo)]
                      + [jnp.zeros(geo.shape, jnp.float32)] * 4)
        return z + eps * (F[0, 50, 50] + R0[0, 50, 50] + T[0, 50, 50])
    run("pack", pack_body, st.z)

    # 6. energy
    run("energy",
        lambda z, e: z + eps * srps.depth_energy(z, e["op"], e["prob"], sf,
                                                 cfg.lam),
        st.z)

    # 7. normals
    from srmeetsps_cuda_tpu.ops import gradients as gradops
    from srmeetsps_cuda_tpu.ops.normals import normals_from_depth

    def norm_body(z, e):
        pr = e["prob"]
        zx = gradops.grad_x(z, pr.gm)
        zy = gradops.grad_y(z, pr.gm)
        N, dz = normals_from_depth(z, zx, zy, pr.xx, pr.yy, pr.mask,
                                   pr.fx, pr.fy)
        return z + eps * (jnp.sum(N[2]) + dz[0, 0])
    run("normals", norm_body, st.z)

    # 8. CG kernel marginal within one launch (caps 25 vs 100)
    if not which or "kernel" in which:
        from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (
            cg_pallas_pipelined_fromop)

        def cg_loop(n, z, e, mi):
            def body(i, zc):
                pr = e["prob"]
                x, k, r1 = cg_pallas_pipelined_fromop(
                    zc, e["op"], pr.gm, pr.ktw, pr.z0t, sf=sf, lam=cfg.lam,
                    tol=1e-30, max_iter=mi)
                return x
            return lax.fori_loop(0, n, body, z)

        f_cg = jax.jit(cg_loop, static_argnums=(0, 3))
        s100 = marginal(lambda n: f_cg(n, st.z, env, 100), n_hi=5)
        s25 = marginal(lambda n: f_cg(n, st.z, env, 25), n_hi=5)
        per = (s100 - s25) / 75
        print(f"{'kernel/iter':<16} {per * 1e6:8.1f} us")
        print(f"{'launch+pack':<16} {(s25 - 25 * per) * 1e3:8.3f} ms/call")

    # 9. whole outer iteration + cap-1 variant
    if not which or "outer" in which:
        def outer_loop(n, carry, e, c):
            def body(i, cr):
                z, rho, s = cr
                st2 = srps.srps_iteration(
                    e["st"]._replace(z=z, rho=rho, s=s), e["prob"], sf, c)
                return (st2.z, st2.rho, st2.s)
            return lax.fori_loop(0, n, body, carry)[0]

        f_outer = jax.jit(outer_loop, static_argnums=(0, 3))
        carry = (st.z, st.rho, st.s)
        ms = marginal(lambda n: f_outer(n, carry, env, cfg), n_hi=5) * 1e3
        print(f"{'outer':<16} {ms:8.3f} ms/iter")
        cfg1 = SolverConfig(use_pallas=True, cg_max_iter=1)
        ms1 = marginal(lambda n: f_outer(n, carry, env, cfg1), n_hi=5) * 1e3
        print(f"{'outer_cap1':<16} {ms1:8.3f} ms/iter")


if __name__ == "__main__":
    main()
