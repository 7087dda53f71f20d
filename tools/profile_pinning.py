"""Confirm/deny the VMEM-pinning hypothesis: compile the in-loop kernel
program and grep the optimized HLO for S(1) (VMEM space) annotations on the
big buffers; then try compiler options that might disable memory-space
assignment, and time the loop under each accepted option."""

from __future__ import annotations

import functools
import re
import sys
import time

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from bench import find_dataset, synthetic_dataset  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402
from srmeetsps_cuda_tpu.solve import pallas_cg as _pcg  # noqa: E402
from srmeetsps_cuda_tpu.solve.pallas_cg_pipe import (  # noqa: E402
    stack_fields_packed)
from tools.profile_loopctx2 import make_raw  # noqa: E402

CAP = 100


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
    cs = jnp.array([[1e-30 ** 2, 0.0, float(CAP)]], jnp.float32)
    jax.block_until_ready((F1, R01, T1))

    raw = make_raw(sf, cfg.lam, geo)

    def loopf(n, T, F, R0, cs):
        def body(i, Tc):
            return raw(cs, Tc, F, R0, max_iter=CAP)[0]
        return lax.fori_loop(0, n, body, T)

    def alonef(T, F, R0, cs):
        return raw(cs, T, F, R0, max_iter=CAP)[0]

    def spaces(text, tag):
        # report memory space of every tensor >= 1 MB in the custom-call
        # lines and while-loop param tuples
        hits = {}
        for m in re.finditer(r"f32\[([\d,]+)\]\{[^}]*?(?:S\((\d)\))?\}",
                             text):
            dims = [int(x) for x in m.group(1).split(",") if x]
            sz = 4 * int(np.prod(dims)) if dims else 4
            if sz >= 1 << 20:
                sp = m.group(2) or "0"
                key = (tuple(dims), sp)
                hits[key] = hits.get(key, 0) + 1
        print(f"--- {tag}: big-buffer spaces (dims, space) -> count")
        for k, v in sorted(hits.items()):
            print(f"    {k[0]} S({k[1]}) x{v}")

    for tag, fn, args in (
            ("alone", jax.jit(alonef), (T1, F1, R01, cs)),
            ("loop4", jax.jit(loopf, static_argnums=0), (4, T1, F1, R01, cs)),
    ):
        txt = fn.lower(*args).compile().as_text()
        spaces(txt, tag)

    # probe candidate compiler options on the loop program
    candidates = [
        {"xla_tpu_enable_while_loop_memory_space_assignment": "false"},
        {"xla_tpu_memory_space_assignment": "false"},
        {"xla_tpu_enable_memory_space_assignment": "false"},
        {"xla_tpu_alternate_memory_budget_fraction": "0"},
        {"xla_tpu_msa_enabled": "false"},
        {"xla_tpu_enable_vmem_prefetching": "false"},
        {"xla_tpu_async_copy_bandwidth_bytes_per_sec": "1"},
        {"xla_tpu_prefer_default_memory_for_while_buffers": "true"},
    ]
    lowered = jax.jit(loopf, static_argnums=0).lower(4, T1, F1, R01, cs)
    for opts in candidates:
        name = list(opts)[0]
        try:
            comp = lowered.compile(compiler_options=opts)
            txt = comp.as_text()
            n_s1 = txt.count("S(1)")
            print(f"option {name}: ACCEPTED, S(1) count = {n_s1}")
        except Exception as e:
            print(f"option {name}: rejected ({str(e)[:90]})")


if __name__ == "__main__":
    main()
