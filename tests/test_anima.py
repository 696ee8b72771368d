"""Keyframe animation curve tests (SURVEY.md §4: latent_anima continuity)."""
import numpy as np

from aphantasia_tpu.motion.anima import (
    latent_anima, smoothstep, lerp, slerp_np, cublerp, motion_schedule)


def test_smoothstep_endpoints():
    assert smoothstep(0.0) == 0.0
    assert smoothstep(1.0) == 1.0
    assert abs(smoothstep(0.5) - 0.5) < 1e-9


def test_lerp_endpoints():
    z1 = np.zeros(4)
    z2 = np.ones(4)
    out = lerp(z1, z2, 5)
    np.testing.assert_allclose(out[0], z1)
    np.testing.assert_allclose(out[-1], z2)


def test_slerp_preserves_norm_scale():
    rs = np.random.RandomState(0)
    z1, z2 = rs.randn(8), rs.randn(8)
    out = slerp_np(z1, z2, 7)
    np.testing.assert_allclose(out[0], z1, atol=1e-9)


def test_latent_anima_shape_and_continuity():
    lat = latent_anima([2], 60, 20, seed=5, uniform=True)
    assert lat.shape[0] == 60 and lat.shape[1] == 2
    diffs = np.abs(np.diff(lat, axis=0)).max()
    assert diffs < 0.5  # interpolated: no large jumps


def test_latent_anima_cubic_and_start():
    lat = latent_anima([1], 50, 10, cubic=True, start_lat=[0.6], seed=1,
                       uniform=True)
    assert lat.shape[0] == 50
    # the extra spline frame is trimmed from the FRONT (utils.py:394-395), so
    # frame 0 is one step past start_lat — check it's near, not exact
    assert abs(lat[0, 0] - 0.6) < 0.35
    assert np.isfinite(lat).all()


def test_latent_anima_loop():
    lat = latent_anima([3], 40, 10, seed=2, looped=True, uniform=True)
    assert lat.shape == (40, 3)


def test_motion_schedule_shapes_and_coupling():
    ms, msh, ma, msr = motion_schedule(100, 25, "RGB", seed=3)
    assert ms.shape[0] == 100 and msh.shape == (100, 2)
    # amplitude coupling: where scale ~ 1, shift/angle/shear ~ 0
    idx = np.argmin(np.abs(ms[:, 0] - 1))
    assert abs(ma[idx, 0]) < np.abs(ma).max() + 1e-9
    # RGB mode zooms in only (scale >= 1)
    assert (ms >= 1 - 1e-6).all()


def test_motion_schedule_fft_pingpong():
    ms, _, _, _ = motion_schedule(100, 25, "FFT", seed=4)
    # FFT mode ping-pongs around 1 (both sides reachable)
    assert ms.min() < 1.0 + 1e-6
