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
        import scipy.io as sio

        p = str(tmp_path / "op.mat")
        writers.save_sparse_mat(p, [0, 1, 2], [2, 0, 1], [1.0, -1.0, 0.5], 3, 3)
        d = sio.loadmat(p)
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
        import scipy.io as sio

        h, w, sf = 16, 12, 2
        mask = random_mask(rng, h, w)
        zs = rng.random((h // sf, w // sf)).astype(np.float32)
        z = rng.random((h, w)).astype(np.float32) * mask
        writers.dump_preprocessing(str(tmp_path), zs, z, mask)
        zs_back = sio.loadmat(str(tmp_path / "zs_init.mat"))["x"].ravel()
        np.testing.assert_allclose(zs_back, zs.T.ravel())  # column-major
        z_back = sio.loadmat(str(tmp_path / "z_init.mat"))["x"].ravel()
        assert z_back.size == int((mask != 0).sum())
        np.testing.assert_allclose(z_back, z.T[mask.T != 0])
