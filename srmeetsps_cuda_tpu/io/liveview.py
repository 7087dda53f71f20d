"""Live visualization windows — the reference's ``cv::imshow`` channel.

The reference pops three OpenCV windows every outer iteration
(SRPS.cu:319-327): "Normals-Initial" (the initialization-time normals,
kept from SRPS.cu:270), "Normals-Current-Iteration", and "Albedo", laid
out left-to-right at ``scale = 0.425f`` with ``cv::moveWindow`` offsets
derived from the image height, then ``cv::waitKey(5)``; after the solve
it blocks on ``cv::waitKey(0)`` (SRPS.cu:338).

This module reproduces that protocol on top of the PNG encoders in
:mod:`.writers` (``normals_image`` / ``albedo_image`` mirror
``N_as_opencv_mat`` / ``rho_as_opencv_mat``, Utilities.cpp:242-298).
cv2 is an *optional* runtime dependency here — everywhere else in the
project it is a test-only oracle — and headless environments (no GUI
backend) disable the viewer on the first failed ``imshow`` with a
warning; the PNG channel (``--viz``) is the durable fallback.
"""

from __future__ import annotations

import os
import sys
import warnings

import numpy as np

from . import writers

# SRPS.cu:320 — the reference's fixed preview scale.
REFERENCE_SCALE = 0.425


class LiveView:
    """Three-window live preview with the reference's titles and layout.

    Parameters
    ----------
    scale:
        Preview downscale factor (reference: 0.425).
    cv2_module:
        Dependency injection for tests; defaults to ``import cv2``.
    """

    @staticmethod
    def _default_cv2():
        try:
            import cv2

            return cv2
        except ImportError:
            return None

    def __init__(self, scale: float = REFERENCE_SCALE, cv2_module=None):
        self.scale = float(scale)
        self.enabled = True
        self._shown = False
        self._init_img = None
        self._cv2 = cv2_module if cv2_module is not None \
            else self._default_cv2()
        if self._cv2 is None:
            warnings.warn("cv2 not available; --show disabled "
                          "(use --viz for PNG output)")
            self.enabled = False
        elif cv2_module is None and sys.platform.startswith("linux") \
                and not (os.environ.get("DISPLAY")
                         or os.environ.get("WAYLAND_DISPLAY")):
            # Must be checked BEFORE the first imshow: cv2's Qt backend
            # hard-aborts the process on a missing display (it does not
            # raise), so the show()-time try/except cannot catch it.
            warnings.warn("no display (DISPLAY/WAYLAND_DISPLAY unset); "
                          "--show disabled (use --viz for PNG output)")
            self.enabled = False

    def _imshow(self, title: str, img_u8: np.ndarray, x: int, y: int):
        cv2 = self._cv2
        img = img_u8[..., ::-1]  # encoders emit RGB; cv2 displays BGR
        if self.scale != 1.0:
            img = cv2.resize(img, (0, 0), fx=self.scale, fy=self.scale)
        cv2.imshow(title, img)
        cv2.moveWindow(title, x, y)

    def set_initial(self, state, mask):
        """Capture the initialization-time normals (SRPS.cu:270) so every
        later :meth:`show` can display them in the first window."""
        if self.enabled:
            self._init_img = writers.normals_image(state.N, mask)

    def show(self, state, mask):
        """Display the reference's three windows for one outer iteration
        (SRPS.cu:319-327: imshow + moveWindow x3, then waitKey(5))."""
        if not self.enabled:
            return
        mask = np.asarray(mask)
        h = mask.shape[0]
        # Reference offsets use the image *height* for the horizontal
        # steps (SRPS.cu:322-326) — mirrored verbatim.
        step = int(30 + h * self.scale)
        try:
            if self._init_img is not None:
                self._imshow("Normals-Initial", self._init_img, 10, 10)
            self._imshow("Normals-Current-Iteration",
                         writers.normals_image(state.N, mask), step, 10)
            self._imshow("Albedo",
                         writers.albedo_image(state.rho, mask),
                         int(30 + 2 * h * self.scale), 10)
            self._cv2.waitKey(5)
            self._shown = True
        except Exception as e:  # headless cv2 raises cv2.error
            warnings.warn(f"live view disabled ({e}); "
                          "use --viz for PNG output")
            self.enabled = False

    def finish(self):
        """Block until a keypress, as the reference does after the solve
        (SRPS.cu:338 ``cv::waitKey(0)``). No-op if nothing was shown."""
        if self.enabled and self._shown:
            self._cv2.waitKey(0)
