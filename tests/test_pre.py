"""Preprocessing parity vs OpenCV (cv2 used ONLY as a test oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from srmeetsps_cuda_tpu.pre.bilateral import bilateral_filter
from srmeetsps_cuda_tpu.pre.inpaint import inpaint_diffusion
from srmeetsps_cuda_tpu.pre.resize import resize_bicubic


class TestBicubic:
    @pytest.mark.parametrize("hw", [(24, 16), (30, 20)])
    @pytest.mark.parametrize("sf", [2, 4])
    def test_upsample_matches_opencv(self, rng, hw, sf):
        h, w = hw
        img = rng.random((h, w)).astype(np.float32)
        want = cv2.resize(img, (w * sf, h * sf), interpolation=cv2.INTER_CUBIC)
        got = np.asarray(resize_bicubic(jnp.asarray(img), h * sf, w * sf))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_non_integer_scale(self, rng):
        img = rng.random((17, 13)).astype(np.float32)
        want = cv2.resize(img, (40, 50), interpolation=cv2.INTER_CUBIC)
        got = np.asarray(resize_bicubic(jnp.asarray(img), 50, 40))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestBilateral:
    def test_matches_opencv(self, rng):
        img = rng.random((32, 24)).astype(np.float32)
        want = cv2.bilateralFilter(img, -1, 2.0, 2.0)
        got = np.asarray(bilateral_filter(jnp.asarray(img), 2.0, 2.0))
        # OpenCV uses a binned exp LUT for float inputs; agreement is to
        # LUT quantisation, not to float roundoff.
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


class TestInpaint:
    def test_preserves_known_and_fills_smoothly(self, rng):
        h, w = 48, 40
        yy, xx = np.mgrid[0:h, 0:w]
        img = (0.5 + 0.3 * np.sin(xx / 7.0) + 0.2 * np.cos(yy / 9.0)).astype(np.float32)
        holes = np.zeros((h, w), np.float32)
        holes[10:20, 8:18] = 1  # 10x10 hole
        holes[30, 25] = 1
        corrupted = img * (1 - holes)
        filled = np.asarray(inpaint_diffusion(jnp.asarray(corrupted), jnp.asarray(holes), 256))
        np.testing.assert_array_equal(filled[holes == 0], corrupted[holes == 0])
        err = np.abs(filled - img)[holes == 1]
        assert err.max() < 0.15, err.max()
        assert err.mean() < 0.05

    def test_comparable_to_telea(self, rng):
        h, w = 48, 40
        yy, xx = np.mgrid[0:h, 0:w]
        img = (0.5 + 0.3 * np.sin(xx / 7.0) + 0.2 * np.cos(yy / 9.0)).astype(np.float32)
        holes = np.zeros((h, w), np.uint8)
        holes[10:20, 8:18] = 1
        corrupted = img * (1 - holes)
        telea = cv2.inpaint(corrupted, holes, 16, cv2.INPAINT_TELEA)
        ours = np.asarray(inpaint_diffusion(jnp.asarray(corrupted), jnp.asarray(holes.astype(np.float32)), 256))
        err_telea = np.abs(telea - img)[holes == 1].mean()
        err_ours = np.abs(ours - img)[holes == 1].mean()
        # our diffusion fill should be in the same quality class as Telea
        assert err_ours < max(2.5 * err_telea, 0.05), (err_ours, err_telea)
