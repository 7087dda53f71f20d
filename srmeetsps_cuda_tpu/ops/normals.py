"""Surface-normal estimation from the masked depth gradient.

Mirrors ``cuda_based_normal_init`` (devicecalls.cu:171-223):

  n = (fx * zx, fy * zy, -z - xx*zx - yy*zy)
  dz = max(1e-10, |n|)
  N  = (n / dz, 1)          # 4th component is the constant SH offset term

The reference spreads this over two cuBLAS axpys + three kernels on three
CUDA streams; here it is one fused elementwise expression. ``dz`` is
returned separately because the depth linearisation freezes it
(devicecalls.cu:583-599 divide by the *previous* dz).

The 4th component is 1 on masked pixels and 0 outside (in the reference it
only exists on masked pixels), so dense masked reductions stay exact.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DZ_EPS = 1e-10


def normals_from_depth(
    z: jax.Array,
    zx: jax.Array,
    zy: jax.Array,
    xx: jax.Array,
    yy: jax.Array,
    mask: jax.Array,
    fx: float,
    fy: float,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(N, dz)`` with ``N: (4, h, w)`` and ``dz: (h, w)``."""
    n1 = fx * zx
    n2 = fy * zy
    n3 = -z - xx * zx - yy * zy
    dz = jnp.maximum(DZ_EPS, jnp.sqrt(n1 * n1 + n2 * n2 + n3 * n3))
    N = jnp.stack([n1 / dz, n2 / dz, n3 / dz, mask], axis=0)
    return N, dz
