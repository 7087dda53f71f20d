"""Live cv::imshow-parity viewer (io/liveview.py) vs SRPS.cu:319-338.

A fake cv2 records the windowing protocol; the encodings themselves are
the PNG encoders already oracle-tested in test_writers.py.
"""

import numpy as np
import pytest

from conftest import random_mask
from srmeetsps_cuda_tpu.config import RuntimeConfig, SolverConfig
from srmeetsps_cuda_tpu.io import liveview, writers
from srmeetsps_cuda_tpu.runtime.solver import solve

from test_e2e import synthetic_data


class FakeCV2:
    """Records imshow/moveWindow/waitKey calls; optionally raises (to model
    a headless cv2 build)."""

    def __init__(self, fail=False):
        self.fail = fail
        self.shown = []       # (title, img)
        self.moved = []       # (title, x, y)
        self.waits = []

    def imshow(self, title, img):
        if self.fail:
            raise RuntimeError("The function is not implemented "
                               "(headless cv2)")
        self.shown.append((title, np.asarray(img)))

    def moveWindow(self, title, x, y):
        self.moved.append((title, x, y))

    def resize(self, img, size, fx=1.0, fy=1.0):
        h, w = img.shape[:2]
        return img[:: max(1, round(1 / fy)), :: max(1, round(1 / fx))]

    def waitKey(self, ms):
        self.waits.append(ms)
        return -1


@pytest.fixture
def tiny_state(rng):
    class S:
        N = rng.standard_normal((4, 12, 16)).astype(np.float32)
        rho = rng.random((3, 12, 16)).astype(np.float32)
    return S(), random_mask(rng, 12, 16)


class TestLiveView:
    def test_window_protocol(self, tiny_state):
        """Reference protocol per iteration: three titled windows, moved to
        the SRPS.cu:321-326 offsets, then waitKey(5); waitKey(0) at end."""
        st, mask = tiny_state
        cv2 = FakeCV2()
        v = liveview.LiveView(cv2_module=cv2)
        v.set_initial(st, mask)
        v.show(st, mask)
        v.show(st, mask)
        v.finish()
        titles = [t for t, _ in cv2.shown]
        assert titles == ["Normals-Initial", "Normals-Current-Iteration",
                          "Albedo"] * 2
        step = int(30 + mask.shape[0] * liveview.REFERENCE_SCALE)
        assert cv2.moved[:3] == [
            ("Normals-Initial", 10, 10),
            ("Normals-Current-Iteration", step, 10),
            ("Albedo", int(30 + 2 * mask.shape[0]
                           * liveview.REFERENCE_SCALE), 10),
        ]
        assert cv2.waits == [5, 5, 0]

    def test_bgr_of_oracle_encoding(self, tiny_state):
        """Displayed pixels are the (channel-reversed, scaled) PNG-encoder
        output — the same encoding the writers tests check vs the
        reference's N_as_opencv_mat/rho_as_opencv_mat."""
        st, mask = tiny_state
        cv2 = FakeCV2()
        v = liveview.LiveView(scale=1.0, cv2_module=cv2)
        v.show(st, mask)
        by_title = dict(cv2.shown)
        np.testing.assert_array_equal(
            by_title["Normals-Current-Iteration"],
            writers.normals_image(st.N, mask)[..., ::-1])
        np.testing.assert_array_equal(
            by_title["Albedo"], writers.albedo_image(st.rho, mask)[..., ::-1])

    def test_headless_auto_disable(self, tiny_state):
        st, mask = tiny_state
        cv2 = FakeCV2(fail=True)
        v = liveview.LiveView(cv2_module=cv2)
        with pytest.warns(UserWarning, match="live view disabled"):
            v.show(st, mask)
        assert not v.enabled
        v.show(st, mask)   # silent no-op afterwards
        v.finish()         # must not block
        assert cv2.waits == []

    def test_no_display_pre_check(self, monkeypatch, tiny_state):
        """Missing DISPLAY disables the viewer at construction: cv2's Qt
        backend ABORTS the process on imshow without a display (observed;
        it does not raise), so show()-time catching is too late."""
        st, mask = tiny_state
        cv2 = FakeCV2()
        monkeypatch.setattr(liveview.LiveView, "_default_cv2",
                            staticmethod(lambda: cv2))
        monkeypatch.delenv("DISPLAY", raising=False)
        monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
        with pytest.warns(UserWarning, match="no display"):
            v = liveview.LiveView()
        assert not v.enabled
        v.show(st, mask)
        v.finish()
        assert cv2.shown == [] and cv2.waits == []

    def test_no_show_no_block(self, tiny_state):
        cv2 = FakeCV2()
        v = liveview.LiveView(cv2_module=cv2)
        v.finish()
        assert cv2.waits == []


class TestSolverIntegration:
    @pytest.mark.parametrize("fused", [False, True])
    def test_per_iteration_windows(self, rng, monkeypatch, fused):
        """solve(live_view=True) drives the viewer once per outer iteration
        in both stepwise and fused modes, with the init normals captured
        up front (SRPS.cu:270,321)."""
        cv2 = FakeCV2()
        monkeypatch.setattr(liveview.LiveView, "_default_cv2",
                            staticmethod(lambda: cv2))
        monkeypatch.setenv("DISPLAY", ":0")  # defeat the headless pre-check
        data, _ = synthetic_data(rng, h=32, w=32, sf=2)
        cfg = SolverConfig(inpaint_iters=32, max_iterations=2)
        final, _ = solve(data, cfg,
                         RuntimeConfig(fused_outer_loop=fused,
                                       live_view=True), verbose=False)
        n_it = int(final.iteration)
        assert n_it >= 1
        titles = [t for t, _ in cv2.shown]
        assert titles == ["Normals-Initial", "Normals-Current-Iteration",
                          "Albedo"] * n_it
        assert cv2.waits == [5] * n_it + [0]
