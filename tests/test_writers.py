"""IO/observability parity: sparse triplet dumps vs the oracle's COO
matrices, BONE colormap vs cv2, preprocessing golden dumps."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import random_mask
from srmeetsps_cuda_tpu.io import sparse_dump, writers
from srmeetsps_cuda_tpu.models import srps
import oracle


def _coo_to_csr(ii, jj, kk, rows, cols):
    return sp.csr_matrix((kk, (ii, jj)), shape=(rows, cols))


class TestSparseDump:
    def test_gradients_match_oracle(self, rng):
        h, w = 20, 14
        mask = random_mask(rng, h, w)
        gm = srps.GradientMasks.from_mask(np.asarray(mask))
        (dx, dy, npix) = sparse_dump.gradient_coo(gm, mask)
        Dx_o, Dy_o, imask, _ = oracle.make_gradient(mask.T.ravel(), h, w)
        assert npix == Dx_o.shape[0]
        Dx = _coo_to_csr(*dx, npix, npix)
        Dy = _coo_to_csr(*dy, npix, npix)
        assert (Dx != Dx_o).nnz == 0
        assert (Dy != Dy_o).nnz == 0

    def test_downsample_matches_oracle(self):
        h, w, sf = 16, 12, 2
        ii, jj, kk, rows, cols = sparse_dump.downsample_coo(h, w, sf)
        D = _coo_to_csr(ii, jj, kk, rows, cols)
        D_o = oracle.downsampling_matrix(h, w, sf)
        assert np.abs(D - D_o).max() < 1e-7

    def test_kt_matches_oracle(self, rng):
        h, w, sf = 24, 16, 2
        mask = random_mask(rng, h, w)
        from srmeetsps_cuda_tpu.ops.grid import lr_mask

        masks = np.asarray(lr_mask(mask, sf))
        ii, jj, kk, rows, cols = sparse_dump.kt_coo(mask, masks, sf)
        KT = _coo_to_csr(ii, jj, kk, rows, cols)
        _, _, KT_o = oracle.lr_mask_and_KT(mask.T.ravel(), h, w, sf)
        assert KT.shape == KT_o.shape
        assert np.abs(KT - KT_o).max() < 1e-7

    def test_save_sparse_mat_roundtrip(self, tmp_path):
        p = str(tmp_path / "op.mat")
        writers.save_sparse_mat(p, [0, 1, 2], [2, 0, 1], [1.0, -1.0, 0.5], 3, 3)
        d = writers.load_mat_any(p)
        assert d["ii"].dtype == np.int32 and d["kk"].dtype == np.float32
        np.testing.assert_array_equal(d["ii"].ravel(), [0, 1, 2])
        np.testing.assert_array_equal(d["jj"].ravel(), [2, 0, 1])
        assert int(d["rows"].ravel()[0]) == 3 and int(d["cols"].ravel()[0]) == 3


class TestBoneColormap:
    def test_matches_cv2_lut(self):
        cv2 = pytest.importorskip("cv2")
        ramp = np.arange(256, dtype=np.uint8).reshape(1, 256)
        want_bgr = cv2.applyColorMap(ramp, cv2.COLORMAP_BONE)[0]  # (256,3) BGR
        got = writers.bone_colormap_lut()  # (256,3) RGB
        diff = np.abs(got[:, ::-1].astype(int) - want_bgr.astype(int))
        assert diff.max() <= 1  # LUT quantisation

    def test_depth_image_masked_black(self, rng):
        h, w = 12, 10
        mask = random_mask(rng, h, w)
        z = (rng.random((h, w)).astype(np.float32) + 0.5) * mask
        img = writers.depth_image(z, mask)
        assert img.shape == (h, w, 3)
        assert np.all(img[np.asarray(mask) == 0] == 0)
        # BONE is bluish: blue channel >= red channel everywhere.
        assert np.all(img[..., 2].astype(int) >= img[..., 0].astype(int) - 1)


class TestPreprocessingDumps:
    def test_zs_and_z_init(self, rng, tmp_path):
        h, w, sf = 16, 12, 2
        mask = random_mask(rng, h, w)
        zs = rng.random((h // sf, w // sf)).astype(np.float32)
        z = rng.random((h, w)).astype(np.float32) * mask
        writers.dump_preprocessing(str(tmp_path), zs, z, mask)
        zs_back = writers.load_mat_any(str(tmp_path / "zs_init.mat"))["x"].ravel()
        np.testing.assert_allclose(zs_back, zs.T.ravel())  # column-major
        z_back = writers.load_mat_any(str(tmp_path / "z_init.mat"))["x"].ravel()
        assert z_back.size == int((mask != 0).sum())
        np.testing.assert_allclose(z_back, z.T[mask.T != 0])


class TestMat73Container:
    """The reference writes HDF5-based MAT 7.3 (Mat_CreateVer MAT73,
    Utilities.cpp:50,69,90); the default dump container must match."""

    def test_userblock_header(self, tmp_path):
        p = str(tmp_path / "x.mat")
        writers.save_vector_mat(p, np.arange(5, dtype=np.float32))
        raw = open(p, "rb").read(512)
        assert raw.startswith(b"MATLAB 7.3 MAT-file")
        assert raw[124:126] == b"\x00\x02"  # version 0x0200
        assert raw[126:128] == b"IM"        # little-endian marker
        # and the payload is a real HDF5 file at the userblock offset
        import h5py

        with h5py.File(p, "r") as f:
            assert f["x"].attrs["MATLAB_class"] == b"single"

    def test_vector_roundtrip_h5py(self, tmp_path):
        p = str(tmp_path / "v.mat")
        v = np.linspace(0, 1, 7).astype(np.float64)
        writers.save_vector_mat(p, v)
        back = writers.load_mat_any(p)["x"]
        assert back.shape == (7, 1)  # MATLAB column vector
        np.testing.assert_allclose(back.ravel(), v)

    def test_mat5_opt_in_matches(self, tmp_path):
        v = np.arange(6, dtype=np.float32)
        p73 = str(tmp_path / "a.mat")
        p5 = str(tmp_path / "b.mat")
        writers.save_vector_mat(p73, v)
        writers.save_vector_mat(p5, v, version="5")
        import scipy.io as sio

        with pytest.raises(NotImplementedError):
            sio.loadmat(p73)  # scipy cannot read 7.3 - proves container
        a = writers.load_mat_any(p73)["x"]
        b = writers.load_mat_any(p5)["x"]
        np.testing.assert_array_equal(a, b)

    def test_dump_state_mat73(self, rng, tmp_path):
        from srmeetsps_cuda_tpu.models.srps import SRPSState

        h, w, c = 8, 6, 3
        mask = random_mask(rng, h, w)
        st = SRPSState(
            z=rng.random((h, w)).astype(np.float32) * mask,
            rho=rng.random((c, h, w)).astype(np.float32),
            s=rng.random((2, c, 4)).astype(np.float32),
            N=rng.random((4, h, w)).astype(np.float32),
            dz=rng.random((h, w)).astype(np.float32),
            energy=np.float32(1.0), last_energy=np.float32(2.0),
            iteration=np.int32(1), cg_iters=np.int32(5))
        writers.dump_state(str(tmp_path), st, mask, fmt="mat")
        z = writers.load_mat_any(str(tmp_path / "z.mat"))["x"]
        assert z.size == int((np.asarray(mask) != 0).sum())
