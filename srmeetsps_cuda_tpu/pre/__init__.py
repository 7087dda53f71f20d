"""LR-depth preprocessing pipeline (reference SRPS.cu:117-149)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SolverConfig
from ..ops.grid import mean_across_frames
from .bilateral import bilateral_filter
from .inpaint import inpaint_diffusion
from .resize import resize_bicubic

__all__ = [
    "bilateral_filter",
    "inpaint_diffusion",
    "resize_bicubic",
    "preprocess_depth",
]


def preprocess_depth(z0, h: int, w: int, cfg: SolverConfig = SolverConfig()):
    """Mean -> inpaint -> max-normalise -> bilateral -> bicubic upsample.

    Mirrors SRPS.cu:117-149 end to end (the reference does the middle three
    steps on the CPU through OpenCV; here the whole chain is device code).

    Args:
      z0: (n, h/sf, w/sf) raw LR depth frames (0 = missing).
      h, w: HR output size.

    Returns:
      (zs, z_init): the smoothed LR depth (h/sf, w/sf) and the bicubic
      HR initial depth (h, w).
    """
    zs_mean, holes = mean_across_frames(jnp.asarray(z0, jnp.float32))
    # Default iteration count derives from the reference's Telea radius
    # (SRPS.cu:133): diffusion closes a hole of radius r in O(r^2) sweeps.
    iters = (cfg.inpaint_iters if cfg.inpaint_iters is not None
             else 2 * cfg.inpaint_radius ** 2)
    zs = inpaint_diffusion(zs_mean, holes, iters=iters)
    mx = jnp.max(zs)
    mx = jnp.where(mx == 0, 1.0, mx)
    zs_n = zs / mx
    zs_f = bilateral_filter(
        zs_n, cfg.bilateral_sigma_color, cfg.bilateral_sigma_space
    ) * mx
    z_init = resize_bicubic(zs_f, h, w)
    return zs_f, z_init
