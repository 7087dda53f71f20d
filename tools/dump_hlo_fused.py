"""Dump optimized TPU HLO for the FUSED solve and census the while-BODY
(the true per-outer-iteration program after LICM).

Usage: python tools/dump_hlo_fused.py [out.txt]
"""

from __future__ import annotations

import re
import sys

sys.stdout.reconfigure(line_buffering=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import find_dataset, synthetic_dataset, _enable_compile_cache  # noqa: E402
from srmeetsps_cuda_tpu.config import SolverConfig  # noqa: E402
from srmeetsps_cuda_tpu.models import srps  # noqa: E402
from srmeetsps_cuda_tpu.runtime.solver import prepare  # noqa: E402


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

    fn = jax.jit(srps.solve_fused, static_argnums=(2, 3))
    compiled = fn.lower(state0, prob, sf, cfg).compile()
    txt = compiled.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")

    # Find the while body computation: the outer while op names its body.
    m = re.search(r"while\([^)]*\), condition=%?([\w.\-]+), body=%?([\w.\-]+)",
                  txt)
    if not m:
        print("no while found")
        return
    body_name = m.group(2)
    # Extract the body computation block (from its def to unindented '}').
    mb = re.search(rf"^%?{re.escape(body_name)} [^\n]*\{{\n(.*?)^\}}", txt,
                   re.M | re.S)
    body = mb.group(1) if mb else ""
    print(f"while body: {body_name}, {len(body.splitlines())} lines")

    kind_count = {}
    big = []
    for line in body.splitlines():
        lm = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^ ]* ([\w\-]+)",
                      line)
        if not lm:
            continue
        dtype, shape_s, op = lm.group(1), lm.group(2), lm.group(3)
        kind_count[op] = kind_count.get(op, 0) + 1
        dims = [int(x) for x in shape_s.split(",") if x]
        elems = int(np.prod(dims)) if dims else 1
        if elems >= 1 << 21:
            big.append((elems, op, dtype, shape_s, line.strip()[:200]))
    print("\nbody op kinds:")
    for k, v in sorted(kind_count.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {k:<22} {v}")
    print("\nbody big ops (>=2M elems):")
    big.sort(reverse=True)
    for elems, op, dtype, shape_s, line in big[:50]:
        print(f"  {elems/1e6:8.1f}M {op:<12} {dtype}[{shape_s}]")
        print(f"        {line}")


if __name__ == "__main__":
    main()
