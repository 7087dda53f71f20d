"""Dump the optimized TPU HLO for one fused outer iteration and summarise
the big non-kernel ops (fusions, copies, transposes) with their shapes.

Usage: python tools/dump_hlo.py [out.txt]
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

    fn = jax.jit(srps.srps_iteration, static_argnums=(2, 3))
    lowered = fn.lower(state0, prob, sf, cfg)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iter_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")

    # Summarise: count op kinds and flag big copies/transposes/reshapes.
    kind_count = {}
    big = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^ ]* (\w+)", line)
        if not m:
            continue
        dtype, shape_s, op = m.group(1), m.group(2), m.group(3)
        kind_count[op] = kind_count.get(op, 0) + 1
        if op in ("copy", "transpose", "reshape", "bitcast-convert",
                  "convert", "all-to-all") or op.startswith("fusion"):
            dims = [int(x) for x in shape_s.split(",") if x]
            elems = int(np.prod(dims)) if dims else 1
            if elems >= 1 << 20:
                big.append((elems, op, dtype, shape_s, line.strip()[:160]))
    print("\nop kinds:")
    for k, v in sorted(kind_count.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {k:<22} {v}")
    print("\nbig (>=1M elem) copies/transposes/converts:")
    big.sort(reverse=True)
    for elems, op, dtype, shape_s, line in big[:40]:
        print(f"  {elems/1e6:8.1f}M {op:<10} {dtype}[{shape_s}]")
        print(f"        {line}")


if __name__ == "__main__":
    main()
