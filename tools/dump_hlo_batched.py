"""HLO census: the lane-batched outer iteration (B=4) vs single.

tools/profile_batched.py measured b1 == single (4.11 vs 4.15
ms/outer-iter) but b4 at 5.13 ms/LANE-iter — a 24% per-lane overhead
that appears only at B>1, i.e. ~4 ms per batch iteration of
vmap-induced cost. Per the project methodology the attribution tool is
the HLO census: dump both compiled bodies and find the big ops whose
count in the B=4 program is not 4x the single program (layout copies /
transposes that vmap introduced).

Usage: python tools/dump_hlo_batched.py [B]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import find_dataset, synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.parallel import batched  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


def census(txt, min_elems=1 << 20):
    kind_count = Counter()
    big = Counter()
    for line in txt.splitlines():
        m = re.match(
            r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^ ]* (\w+)", line)
        if not m:
            continue
        dtype, shape_s, op = m.group(1), m.group(2), m.group(3)
        kind_count[op] += 1
        dims = [int(x) for x in shape_s.split(",") if x]
        elems = int(np.prod(dims)) if dims else 1
        if elems >= min_elems:
            big[f"{op} {dtype}[{shape_s}]"] += 1
    return kind_count, big


def main():
    _enable_compile_cache()
    # --chain: census the fori-chained programs (tools/profile_batched.py's
    # measured object) instead of the single-call bodies — loop-invariant
    # input relayouts (e.g. the probs.I copy) are hoisted there and do NOT
    # cost per-iteration time; only body ops do.
    chain = "--chain" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 4
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    sf = int(data.sf)
    cfg = SolverConfig(use_pallas=True)
    prob, state0 = prepare(data, cfg)
    st = jax.jit(srps.srps_iteration, static_argnums=(2, 3))(
        state0, prob, sf, cfg)

    from jax import lax

    def chained(iter_fn):
        def run(n, carry, e, c):
            def body(i, cr):
                z, rho, s, N, dz = cr
                st2 = iter_fn(
                    e["st"]._replace(z=z, rho=rho, s=s, N=N, dz=dz),
                    e["prob"], sf, c)
                return (st2.z, st2.rho, st2.s, st2.N, st2.dz)

            return lax.fori_loop(0, n, body, carry)

        return jax.jit(run, static_argnums=(0, 3))

    sfx = "_chain" if chain else ""
    if chain:
        fn1 = chained(srps.srps_iteration)
        carry1 = (st.z, st.rho, st.s, st.N, st.dz)
        txt1 = fn1.lower(8, carry1, dict(prob=prob, st=st),
                         cfg).compile().as_text()
    else:
        fn1 = jax.jit(srps.srps_iteration, static_argnums=(2, 3))
        txt1 = fn1.lower(st, prob, sf, cfg).compile().as_text()
    with open(f"/tmp/iter_hlo_single{sfx}.txt", "w") as f:
        f.write(txt1)
    print(f"single: {len(txt1)} bytes -> /tmp/iter_hlo_single{sfx}.txt")

    pb = batched.stack_problems([prob] * B)
    sb = batched.stack_states([st] * B)
    if chain:
        fnB = chained(batched._iteration_batched_pallas)
        carryB = (sb.z, sb.rho, sb.s, sb.N, sb.dz)
        txtB = fnB.lower(8, carryB, dict(prob=pb, st=sb),
                         cfg).compile().as_text()
    else:
        fnB = jax.jit(batched._iteration_batched_pallas,
                      static_argnums=(2, 3))
        txtB = fnB.lower(sb, pb, sf, cfg).compile().as_text()
    with open(f"/tmp/iter_hlo_b{B}{sfx}.txt", "w") as f:
        f.write(txtB)
    print(f"b{B}: {len(txtB)} bytes -> /tmp/iter_hlo_b{B}{sfx}.txt")

    c1, big1 = census(txt1)
    cB, bigB = census(txtB)
    print("\nop-kind counts (B-program vs single; flag != x{}):".format(B))
    for k in sorted(set(c1) | set(cB)):
        n1, nB = c1.get(k, 0), cB.get(k, 0)
        flag = "  <-- " if nB not in (n1, 0) and abs(nB - n1) > 2 else ""
        print(f"  {k:<22} single={n1:<4} b{B}={nB:<4}{flag}")
    print(f"\nbig (>=1M elem) ops in b{B} (count x shape):")
    for s, n in bigB.most_common(40):
        print(f"  {n}x {s}")
    print("\nbig (>=1M elem) ops in single:")
    for s, n in big1.most_common(40):
        print(f"  {n}x {s}")


if __name__ == "__main__":
    main()
