"""Result dumps and visualizations.

The reference dumps ``s.mat/rho.mat/z.mat/N.mat`` every outer iteration
(SRPS.cu:330-333; writers Utilities.cpp:46-122, variable name ``x``,
masked pixels packed in column-major scan order) as its golden-output
verification channel, and shows normals/albedo in OpenCV windows
(SRPS.cu:319-327). Here: ``scipy.io.savemat`` / ``npz`` with the same
packing convention, and PNG snapshots replacing the interactive windows.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..ops.grid import masked_select_colmajor


def save_vector_mat(path: str, data: np.ndarray):
    """Single packed vector under variable name 'x' (Utilities.cpp:46-63)."""
    import scipy.io as sio

    sio.savemat(path, {"x": np.asarray(data).reshape(-1, 1)})


def dump_state(dirpath: str, state, mask, fmt: str = "mat", tag: str = ""):
    """Dump s/rho/z/N with the reference's packing (column-major masked)."""
    os.makedirs(dirpath, exist_ok=True)
    mask = np.asarray(mask)
    z = masked_select_colmajor(np.asarray(state.z), mask)
    rho = np.stack(
        [masked_select_colmajor(np.asarray(c), mask) for c in np.asarray(state.rho)]
    )
    N = np.stack(
        [masked_select_colmajor(np.asarray(k), mask) for k in np.asarray(state.N)]
    )
    s = np.asarray(state.s)
    if fmt == "mat":
        # Reference flattens s as (n, c, 4) row-major contiguous
        # (d_s layout: image-major, then channel, then harmonic).
        save_vector_mat(os.path.join(dirpath, f"s{tag}.mat"), s.reshape(-1))
        save_vector_mat(os.path.join(dirpath, f"rho{tag}.mat"), rho.reshape(-1))
        save_vector_mat(os.path.join(dirpath, f"z{tag}.mat"), z)
        save_vector_mat(os.path.join(dirpath, f"N{tag}.mat"), N.reshape(-1))
    else:
        np.savez(
            os.path.join(dirpath, f"state{tag}.npz"), s=s, rho=rho, z=z, N=N
        )


def save_checkpoint(path: str, state, iteration: int):
    """Full-resolution resumable checkpoint (the reference dumps but has no
    load path — SURVEY.md section 5; we add resume since it's nearly free)."""
    np.savez(
        path,
        z=np.asarray(state.z),
        rho=np.asarray(state.rho),
        s=np.asarray(state.s),
        N=np.asarray(state.N),
        dz=np.asarray(state.dz),
        energy=np.asarray(state.energy),
        last_energy=np.asarray(state.last_energy),
        iteration=iteration,
    )


def load_checkpoint(path: str):
    d = np.load(path)
    return {k: d[k] for k in d.files}


def _to_u8(a):
    return np.clip(a * 255.0, 0, 255).astype(np.uint8)


def normals_image(N, mask) -> np.ndarray:
    """0.5 +/- 0.5 encoding with min-max normalise (Utilities.cpp:280-298)."""
    N = np.asarray(N)
    mask = np.asarray(mask) != 0
    img = np.zeros(mask.shape + (3,), np.float32)
    img[..., 0] = np.clip(0.5 + 0.5 * N[0], 0, 1)
    img[..., 1] = np.clip(0.5 + 0.5 * N[1], 0, 1)
    img[..., 2] = np.clip(0.5 - 0.5 * N[2], 0, 1)
    img *= mask[..., None]
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo)
    return _to_u8(img)


def albedo_image(rho, mask) -> np.ndarray:
    """Median + 5 sigma clamp per channel (Utilities.cpp:242-278)."""
    rho = np.asarray(rho)
    mask = np.asarray(mask) != 0
    img = np.zeros(mask.shape + (rho.shape[0],), np.float32)
    for c in range(rho.shape[0]):
        vals = rho[c][mask]
        med = np.median(vals)
        std = float(np.sqrt(np.mean(vals**2) - np.mean(vals) ** 2))
        clamp = med + 5 * std
        img[..., c] = np.clip(np.minimum(rho[c], clamp), 0, 1) * mask
    return _to_u8(img)


def depth_image(z, mask) -> np.ndarray:
    """Negated min-max normalised grayscale (Utilities.cpp:300-320 uses
    COLORMAP_BONE; we emit the underlying grayscale ramp)."""
    z = np.asarray(z)
    mask = np.asarray(mask) != 0
    vals = -z[mask]
    lo, hi = vals.min(), vals.max()
    g = np.zeros(mask.shape, np.float32)
    if hi > lo:
        g[mask] = (-z[mask] - lo) / (hi - lo)
    return _to_u8(g)


def save_png(path: str, img_u8: np.ndarray):
    from PIL import Image

    Image.fromarray(img_u8).save(path)


def save_visualizations(dirpath: str, state, mask, tag: str = ""):
    os.makedirs(dirpath, exist_ok=True)
    save_png(os.path.join(dirpath, f"normals{tag}.png"), normals_image(state.N, mask))
    save_png(os.path.join(dirpath, f"albedo{tag}.png"), albedo_image(state.rho, mask))
    save_png(os.path.join(dirpath, f"depth{tag}.png"), depth_image(state.z, mask))
