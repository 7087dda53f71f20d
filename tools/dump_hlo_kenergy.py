"""Diff the optimized outer-iteration HLO with kernel_energy on vs off.

The interleaved timing harness (tools/profile_kenergy.py) measured the
in-kernel energy epilogue ~1.6-2.0 ms/outer-iter SLOWER than the XLA
energy pass it replaces — even when both variants compiled the identical
Mosaic kernel (pre-track_e builds), so the cost must be in the
surrounding XLA graph. Per the project methodology, ablation deltas are
attributed with the while-body HLO census, not guesses: this dumps both
programs and reports the op-kind counts and big-tensor ops that differ.

Usage: python tools/dump_hlo_kenergy.py
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


def census(txt):
    kind_count = {}
    big = []
    for line in txt.splitlines():
        m = re.match(
            r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^ ]* (\w+)", line)
        if not m:
            continue
        dtype, shape_s, op = m.group(1), m.group(2), m.group(3)
        kind_count[op] = kind_count.get(op, 0) + 1
        dims = [int(x) for x in shape_s.split(",") if x]
        elems = int(np.prod(dims)) if dims else 1
        if elems >= 1 << 20:
            big.append(f"{op} {dtype}[{shape_s}]")
    return kind_count, big


def main():
    _enable_compile_cache()
    ds = find_dataset()
    if ds:
        from srmeetsps_cuda_tpu.io.image_loader import load_image_dataset

        data = load_image_dataset(ds)
    else:
        data = synthetic_dataset()
    sf = int(data.sf)
    prob, state0 = prepare(data, SolverConfig(use_pallas=True))

    txts = {}
    for name, ke in (("on", True), ("off", False)):
        cfg = SolverConfig(use_pallas=True, kernel_energy=ke)
        fn = jax.jit(srps.srps_iteration, static_argnums=(2, 3))
        txt = fn.lower(state0, prob, sf, cfg).compile().as_text()
        path = f"/tmp/iter_hlo_ke_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"kernel_energy={name}: {len(txt)} bytes -> {path}")
        txts[name] = txt

    c_on, big_on = census(txts["on"])
    c_off, big_off = census(txts["off"])
    print("\nop-kind deltas (on - off), nonzero only:")
    for k in sorted(set(c_on) | set(c_off)):
        d = c_on.get(k, 0) - c_off.get(k, 0)
        if d:
            print(f"  {k:<22} {d:+d}  (on={c_on.get(k, 0)} "
                  f"off={c_off.get(k, 0)})")
    from collections import Counter

    bon, boff = Counter(big_on), Counter(big_off)
    print("\nbig (>=1M elem) ops only in ON:")
    for s, n in (bon - boff).most_common(30):
        print(f"  {n}x {s}")
    print("\nbig (>=1M elem) ops only in OFF:")
    for s, n in (boff - bon).most_common(30):
        print(f"  {n}x {s}")


if __name__ == "__main__":
    main()
