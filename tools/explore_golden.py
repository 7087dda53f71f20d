"""Scratch exploration for the real-data (Mitten) golden parity test.

Loads the actual Mitten dataset, downscales it (strided sampling keeps
real intensities / mask topology / depth holes), runs the framework
end-to-end AND the f64 oracle full chain (cv2 Telea/bilateral/bicubic as
the preprocessing oracle), and prints per-iteration s/rho/energy deltas
plus the final-z RMSE — the numbers to freeze into
tests/test_golden_mitten.py.
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import cv2
import oracle
from srmeetsps_cuda_tpu.config import RuntimeConfig, SolverConfig
from srmeetsps_cuda_tpu.io.image_loader import ProblemData, load_image_dataset
from srmeetsps_cuda_tpu.models import srps
from srmeetsps_cuda_tpu.ops.grid import masked_select_colmajor as pack
from srmeetsps_cuda_tpu.runtime.solver import prepare, solve

DS = 8          # spatial downscale factor (strided)
N_IMG = 6       # image subset


def mitten_small():
    data = load_image_dataset("/root/reference/dataset/Images/Mitten")
    I = data.I[:N_IMG, :, ::DS, ::DS]
    mask = data.mask[::DS, ::DS]
    z0 = data.z0[:N_IMG, ::DS, ::DS]
    return ProblemData(I=np.ascontiguousarray(I), K=data.K,
                       mask=np.ascontiguousarray(mask), sf=int(data.sf),
                       z0=np.ascontiguousarray(z0))


def cv2_preprocess(z0, h, w):
    """Literal mirror of SRPS.cu:117-149 with OpenCV."""
    n = z0.shape[0]
    mean = z0.sum(0) / float(n)
    holes = np.any(z0 == 0.0, axis=0).astype(np.uint8)
    inp = cv2.inpaint(mean.astype(np.float32), holes, 16, cv2.INPAINT_TELEA)
    mx = inp.max()
    zn = inp / mx
    zf = cv2.bilateralFilter(zn, -1, 2.0, 2.0) * mx
    z_init = cv2.resize(zf, (w, h), interpolation=cv2.INTER_CUBIC)
    return zf, z_init


def oracle_chain(data, z_init_hr, zs_lr, max_outer=10, tol=5e-3):
    """Full oracle alternation with the reference stopping rule."""
    h, w = data.mask.shape
    sf = int(data.sf)
    n, c = data.I.shape[:2]
    mask_cm = (data.mask != 0).astype(np.float32).T.ravel()
    Dx, Dy, imask, _ = oracle.make_gradient(mask_cm, h, w)
    masks_flat, imasks, KT = oracle.lr_mask_and_KT(mask_cm, h, w, sf)
    masks2d = masks_flat.reshape(w // sf, h // sf).T  # col-major -> (h/sf, w/sf)
    fx, fy = float(data.K[0, 0]), float(data.K[1, 1])
    cx, cy = float(data.K[0, 2]), float(data.K[1, 2])
    # NOTE: cx,cy in K are for the FULL-RES grid; the downscaled fixture
    # reuses them (geometry consistent as long as both sides agree).
    yy2, xx2 = np.mgrid[0:h, 0:w]
    xx = (xx2 - cx).astype(np.float32)
    yy = (yy2 - cy).astype(np.float32)
    m2 = data.mask != 0
    I_pack = np.stack([
        np.stack([pack(data.I[i, ch], m2) for ch in range(c)])
        for i in range(n)])
    xx_p, yy_p = pack(xx, m2), pack(yy, m2)
    z0s_pack = pack(zs_lr * (masks2d != 0), masks2d)
    z = pack(z_init_hr, m2).astype(np.float64)
    zx, zy = Dx @ z, Dy @ z
    N, dz = oracle.normals(z, zx, zy, xx_p, yy_p, fx, fy)
    s = np.tile(np.array([0.0, 0.0, -1.0, 0.0]), (n, c, 1))
    rho = np.full((c, len(imask)), 0.5)

    traj = []
    last_energy = np.nan
    it = 1
    while True:
        t0 = time.perf_counter()
        s = oracle.lighting_solve(rho, N, I_pack, s)
        rho = oracle.albedo_solve(N, s, I_pack, rho)
        M, rhs, A, B = oracle.depth_system(
            rho, dz, s, xx_p, yy_p, fx, fy, Dx, Dy, KT, z0s_pack, I_pack)
        b_res = rhs - M @ z
        z, k = oracle.cg(M, b_res, z, tol=1e-9, max_iter=100,
                         dtype=np.float32)
        z = z.astype(np.float64)
        energy = oracle.depth_energy(z, A, B, KT, z0s_pack)
        zx, zy = Dx @ z, Dy @ z
        N, dz = oracle.normals(z, zx, zy, xx_p, yy_p, fx, fy)
        dt = time.perf_counter() - t0
        rel = abs(last_energy - energy) / abs(energy)
        traj.append(dict(s=s.copy(), rho=rho.copy(), z=z.copy(),
                         energy=energy, cg=k))
        print(f"  oracle it {it}: energy={energy:.6f} rel={rel:.2e} "
              f"cg={k} ({dt:.1f}s)")
        stop = (energy > last_energy) or (rel < tol) or (it >= max_outer)
        last_energy = energy
        it += 1
        if stop or np.isnan(energy):
            break
    return traj, m2


def main():
    data = mitten_small()
    h, w = data.mask.shape
    print(f"fixture: {h}x{w}, n={data.I.shape[0]}, sf={data.sf}, "
          f"masked={int((data.mask != 0).sum())}")

    # --- framework, own preprocessing -------------------------------
    cfg = SolverConfig()
    t0 = time.perf_counter()
    prob, state0, zs_fw = prepare(data, cfg, return_zs=True)
    final, metrics = solve(data, cfg, RuntimeConfig(), verbose=False)
    print(f"framework: {time.perf_counter() - t0:.1f}s, "
          f"iters={int(final.iteration)}, "
          f"energy={float(final.energy):.6f}")
    for r in metrics:
        if "energy" in r:
            print(f"  fw it {r['iteration']}: energy={r['energy']:.6f}")

    # --- oracle, cv2 preprocessing ----------------------------------
    zs_cv, z_init_cv = cv2_preprocess(data.z0, h, w)
    m2 = data.mask != 0
    zi_fw = np.asarray(state0.z)
    zi_cv = z_init_cv * m2
    d_init = np.sqrt(np.mean((zi_fw - zi_cv)[m2] ** 2))
    scale = np.sqrt(np.mean(zi_cv[m2] ** 2))
    print(f"init-z RMSE fw-vs-cv2: {d_init:.4f} (rel {d_init/scale:.2e}); "
          f"zs RMSE: {np.sqrt(np.mean((np.asarray(zs_fw) - zs_cv)**2)):.4f}")

    t0 = time.perf_counter()
    traj, _ = oracle_chain(data, z_init_cv, zs_cv)
    print(f"oracle chain: {time.perf_counter() - t0:.1f}s, "
          f"{len(traj)} iterations")

    zf_fw = pack(np.asarray(final.z), m2)
    zf_or = traj[-1]["z"]
    rmse = np.sqrt(np.mean((zf_fw - zf_or) ** 2))
    print(f"FINAL z RMSE fw-vs-oracle: {rmse:.5f} (rel {rmse/scale:.3e})")
    print(f"final energies: fw={float(final.energy):.6f} "
          f"oracle={traj[-1]['energy']:.6f} "
          f"ratio={float(final.energy)/traj[-1]['energy']:.4f}")

    # --- trajectory parity from the SAME init (operator semantics) --
    print("\nsame-init parity (oracle consumes framework preprocessing):")
    traj2, _ = oracle_chain(data, zi_fw, np.asarray(zs_fw), max_outer=3)
    st = state0
    for it in range(len(traj2)):
        st = srps.srps_iteration(st, prob, int(data.sf), cfg)
        o = traj2[it]
        ds_ = np.abs(np.asarray(st.s) - o["s"]).max()
        rho_fw = np.stack([pack(np.asarray(st.rho[ch]), m2)
                           for ch in range(st.rho.shape[0])])
        drho = np.abs(rho_fw - o["rho"]).max()
        z_fw = pack(np.asarray(st.z), m2)
        dz_ = np.sqrt(np.mean((z_fw - o["z"]) ** 2)) / scale
        de = abs(float(st.energy) - o["energy"]) / o["energy"]
        print(f"  it {it+1}: |ds|={ds_:.2e} |drho|={drho:.2e} "
              f"zRMSErel={dz_:.2e} dE/E={de:.2e}")


if __name__ == "__main__":
    main()
