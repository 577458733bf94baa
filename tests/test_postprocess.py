"""Functional upscale / frame interpolation (reference args.py:277-290
carries these fields as stubs; here they act — t2v/media/postprocess.py)."""

import numpy as np
import pytest

from t2v.core.config import T2VOutputArgs
from t2v.media.postprocess import (
    interpolate_frames,
    postprocess_frames,
    upscale_frames,
)


def _square_frame(x0: int, size: int = 12, hw: int = 64) -> np.ndarray:
    f = np.zeros((hw, hw, 3), np.uint8)
    f[26 : 26 + size, x0 : x0 + size] = 255
    return f


class TestUpscale:
    @pytest.mark.parametrize("factor,mult", [("x2", 2), ("x3", 3), ("x4", 4)])
    def test_shapes(self, factor, mult):
        frames = [_square_frame(10), _square_frame(20)]
        out = upscale_frames(frames, factor)
        assert len(out) == 2
        assert out[0].shape == (64 * mult, 64 * mult, 3)
        assert out[0].dtype == np.uint8

    def test_bad_factor(self):
        with pytest.raises(ValueError):
            upscale_frames([_square_frame(0)], "x5")

    def test_identity_factor(self):
        frames = [_square_frame(10)]
        out = upscale_frames(frames, 1)
        np.testing.assert_array_equal(out[0], frames[0])


class TestInterpolate:
    def test_count_and_endpoints(self):
        frames = [_square_frame(8), _square_frame(24), _square_frame(40)]
        out = interpolate_frames(frames, 4)
        assert len(out) == (3 - 1) * 4 + 1
        np.testing.assert_array_equal(out[0], frames[0])
        np.testing.assert_array_equal(out[4], frames[1])
        np.testing.assert_array_equal(out[-1], frames[2])

    def test_midframe_tracks_motion(self):
        # square moves 6 px right (overlapping positions — trackable flow);
        # the x2 in-between's centroid should sit ~halfway
        a, b = _square_frame(16), _square_frame(22)
        mid = interpolate_frames([a, b], 2)[1]
        ys, xs = np.nonzero(mid[..., 0] > 128)
        assert len(xs) > 0
        cx = xs.mean()
        true_mid = (16 + 22) / 2 + 6  # + half square width
        assert abs(cx - true_mid) < 2.0, cx

    def test_x1_is_noop(self):
        frames = [_square_frame(8), _square_frame(16)]
        assert len(interpolate_frames(frames, 1)) == 2


class TestPostprocessArgs:
    def test_fps_and_length_semantics(self):
        frames = [_square_frame(8), _square_frame(16), _square_frame(24)]
        out_args = T2VOutputArgs(
            fps=10,
            frame_interpolation_engine="FILM",
            frame_interpolation_x_amount=3,
        )
        out, fps = postprocess_frames(frames, out_args)
        assert len(out) == (3 - 1) * 3 + 1
        assert fps == 30

    def test_slow_mo_divides_fps(self):
        frames = [_square_frame(8), _square_frame(16)]
        out_args = T2VOutputArgs(
            fps=10,
            frame_interpolation_engine="RIFE v4.6",
            frame_interpolation_x_amount=2,
            frame_interpolation_slow_mo_enabled=True,
            frame_interpolation_slow_mo_amount=2,
        )
        out, fps = postprocess_frames(frames, out_args)
        assert len(out) == 3
        assert fps == 10.0  # x2 interp, /2 slow-mo

    def test_upscale_only(self):
        frames = [_square_frame(8)]
        out_args = T2VOutputArgs(fps=15, r_upscale_video=True, r_upscale_factor="x2")
        out, fps = postprocess_frames(frames, out_args)
        assert out[0].shape == (128, 128, 3)
        assert fps == 15.0
