"""Banded-matmul exact perspective kernel (ops/pallas_persp.py) vs the
XLA gather op (ops/perspective.py:homography_warp — itself torch-golden in
tests/test_perspective.py, so parity here transitively binds the kernel to
torchvision RandomPerspective semantics; VERDICT r1 item 3).

Runs in Pallas interpret mode on CPU; the same code compiles via Mosaic on
the TPU.  White-noise inputs (point-exactness, nothing smooth to hide
behind); the extreme-corner configs stress the compile-time window bound
(k_fwd/k_bwd) at its measured family maximum.
"""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.pallas_persp import perspective_warp, k_fwd, k_bwd
from aphantasia_tpu.ops.perspective import (perspective_endpoints,
                                            perspective_coeffs,
                                            homography_warp)

pytestmark = pytest.mark.slow


def _family(key, s, h, w, p=0.7):
    sp, ep = perspective_endpoints(key, s, h, w, distortion=0.33, p=p)
    coef = perspective_coeffs(sp, ep)
    flags = (jnp.abs(ep - sp[None]).max((1, 2)) > 0).astype(jnp.int32)
    return coef, flags


@pytest.mark.parametrize("hw", [(64, 48), (224, 224)])
def test_persp_kernel_matches_xla_op(hw):
    h, w = hw
    s = 6
    img = jax.random.normal(jax.random.PRNGKey(1), (s, 3, h, w), jnp.float32)
    coef, flags = _family(jax.random.PRNGKey(0), s, h, w)
    assert int(flags.sum()) not in (0, s)   # mixed identity-skip batch
    out = jax.jit(perspective_warp)(img, coef, flags)
    ref = homography_warp(img, coef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    # non-drawn samples copy EXACTLY (torchvision returns input unchanged)
    for i in np.where(np.asarray(flags) == 0)[0]:
        assert (np.asarray(out[i]) == np.asarray(img[i])).all()

    co = jax.random.normal(jax.random.PRNGKey(2), img.shape)
    g1 = jax.jit(jax.grad(
        lambda x: jnp.sum(perspective_warp(x, coef, flags) * co)))(img)
    g2 = jax.grad(lambda x: jnp.sum(homography_warp(x, coef) * co))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_persp_kernel_extreme_corners_window_bound():
    """The 2^8 extreme integer corner draws maximize the tile y-range
    (the k_fwd/k_bwd sizing measurement) — parity must hold right at the
    bound, forward and backward."""
    h = w = 224
    dw, dh = int(0.33 * (w // 2)), int(0.33 * (h // 2))
    los_his = [(0, dw), (0, dh), (w - dw - 1, w - 1), (0, dh),
               (w - dw - 1, w - 1), (h - dh - 1, h - 1),
               (0, dw), (h - dh - 1, h - 1)]
    pts = np.array(list(itertools.product(*[(lo, hi) for lo, hi in los_his])),
                   np.float32)
    pick = pts[np.random.RandomState(0).choice(len(pts), 8, replace=False)]
    ep = jnp.asarray(pick).reshape(-1, 4, 2)
    sp = jnp.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                     jnp.float32)
    coef = perspective_coeffs(sp, ep)
    s = coef.shape[0]
    img = jax.random.normal(jax.random.PRNGKey(1), (s, 3, h, w), jnp.float32)
    flags = jnp.ones((s,), jnp.int32)
    out = jax.jit(perspective_warp)(img, coef, flags)
    ref = homography_warp(img, coef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    co = jax.random.normal(jax.random.PRNGKey(2), img.shape)
    g1 = jax.jit(jax.grad(
        lambda x: jnp.sum(perspective_warp(x, coef, flags) * co)))(img)
    g2 = jax.grad(lambda x: jnp.sum(homography_warp(x, coef) * co))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_persp_kernel_tier_mix():
    """One batch spanning all three pl.when branches — identity copy,
    small-window tier (typical draw) and full-window tier (extreme
    corners) — must match the XLA op, fwd and bwd."""
    from aphantasia_tpu.ops.pallas_persp import (_fwd_bases_tiered, k_small,
                                                 k_fwd, _TV)
    h = w = 224
    dw, dh = int(0.33 * (w // 2)), int(0.33 * (h // 2))
    # extreme quad (full-window tier), mild quad (small tier), identity
    ep = jnp.asarray([
        [[dw, dh], [w - dw - 1, 0], [w - 1, h - 1], [0, h - dh - 1]],
        [[2, 1], [w - 3, 2], [w - 2, h - 2], [1, h - 3]],
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
    ], jnp.float32)
    sp = jnp.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                     jnp.float32)
    coef = perspective_coeffs(sp, ep)
    flags = jnp.asarray([1, 1, 0], jnp.int32)
    tiers, _ = _fwd_bases_tiered(coef, flags, h, w, _TV, k_small(h), k_fwd(h))
    assert sorted(np.asarray(tiers).tolist()) == [0, 1, 2], tiers

    img = jax.random.normal(jax.random.PRNGKey(1), (3, 3, h, w), jnp.float32)
    out = jax.jit(perspective_warp)(img, coef, flags)
    ref = homography_warp(img, coef)
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(ref[:2]),
                               atol=1e-3)
    assert (np.asarray(out[2]) == np.asarray(img[2])).all()
    co = jax.random.normal(jax.random.PRNGKey(2), img.shape)
    g1 = jax.jit(jax.grad(
        lambda x: jnp.sum(perspective_warp(x, coef, flags) * co)))(img)
    g2 = jax.grad(lambda x: jnp.sum(homography_warp(x, coef) * co))(img)
    np.testing.assert_allclose(np.asarray(g1[:2]), np.asarray(g2[:2]),
                               atol=1e-3)


def test_persp_kernel_window_formulas():
    """Window bounds stay within the array and cover the measured family
    maxima (0.728*h fwd / 0.243*h bwd + taps)."""
    for h in (32, 64, 224, 288, 384):
        assert k_fwd(h) <= h and k_fwd(h) >= min(h, int(0.728 * h) + 3)
        assert k_bwd(h) <= h and k_bwd(h) >= min(h, int(0.243 * h) + 3)
        assert k_fwd(h) % 16 == 0 or k_fwd(h) == h


def test_persp_kernel_bf16_envelope():
    """Production dtype path: bf16 taps/weights stay within the bf16
    rounding envelope of the fp32 exact op."""
    h, w, s = 64, 48, 4
    img = jax.random.normal(jax.random.PRNGKey(1), (s, 3, h, w),
                            jnp.float32)
    coef, flags = _family(jax.random.PRNGKey(0), s, h, w, p=1.0)
    out = perspective_warp(img.astype(jnp.bfloat16), coef, flags)
    ref = homography_warp(img, coef)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05)


def test_persp_kernel_odd_height_falls_back():
    """H not a multiple of 16 routes to the XLA gather op."""
    h, w, s = 40, 48, 3
    img = jax.random.normal(jax.random.PRNGKey(1), (s, 3, h, w), jnp.float32)
    coef, flags = _family(jax.random.PRNGKey(0), s, h, w, p=1.0)
    out = perspective_warp(img, coef, flags)
    ref = homography_warp(img, coef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rotate_family_matches_xla_op():
    """The "rotate" window family (the fully-exact pipeline's rotate
    stage): kernel vs the XLA gather op over the full ±30° torchvision
    angle menu, white noise, value + VJP.  homography_warp's rotation
    semantics are themselves torch-golden (tests/test_perspective.py:
    test_rotation_value_parity), so this transitively binds the kernel
    rotate stage to torchvision F.affine."""
    from aphantasia_tpu.ops.perspective import rotation_coeffs_for

    h = w = 64
    angles = jnp.asarray([-30.0, -17.0, -3.0, 0.0, 8.0, 15.0, 29.0])
    s = angles.shape[0]
    img = jax.random.normal(jax.random.PRNGKey(5), (s, 3, h, w), jnp.float32)
    coef = rotation_coeffs_for(angles, h, w)
    flags = (jnp.abs(angles) > 0).astype(jnp.int32)

    out = perspective_warp(img, coef, flags, family="rotate")
    ref = jnp.where((flags > 0)[:, None, None, None],
                    homography_warp(img, coef), img)
    assert float(jnp.abs(out - ref).max()) <= 1e-3

    co = jax.random.normal(jax.random.PRNGKey(6), img.shape)
    g1 = jax.grad(lambda x: jnp.sum(
        perspective_warp(x, coef, flags, family="rotate") * co))(img)
    g2 = jax.grad(lambda x: jnp.sum(jnp.where(
        (flags > 0)[:, None, None, None],
        homography_warp(x, coef), x) * co))(img)
    assert float(jnp.abs(g1 - g2).max()) <= 1e-3


def test_exact_pipeline_rotate_stage_torch_golden():
    """transforms_fast's kernel rotate stage vs the torch grid_sample
    oracle directly (not just transitively): bilinear, zeros, fill-0."""
    torch = pytest.importorskip("torch")
    from aphantasia_tpu.ops.perspective import rotation_coeffs_for
    from tests.test_perspective import _torch_rotate

    h = w = 64
    rng = np.random.RandomState(7)
    img = rng.rand(1, 3, h, w).astype(np.float32)
    for angle in (-29.0, -12.0, 4.0, 30.0):
        coef = rotation_coeffs_for(jnp.asarray([angle], jnp.float32), h, w)
        got = np.asarray(perspective_warp(
            jnp.asarray(img), coef, jnp.ones((1,), jnp.int32),
            family="rotate"))
        want = _torch_rotate(torch.from_numpy(img), angle).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_compact_matches_full_and_overflow_falls_back():
    """perspective_warp_compact == perspective_warp (fwd + grad), in both
    regimes: drawn-count within budget (compact branch) and overflow
    (full-batch fallback branch under lax.cond)."""
    from aphantasia_tpu.ops.pallas_persp import perspective_warp_compact
    h = w = 48
    s = 12
    img = jax.random.normal(jax.random.PRNGKey(1), (s, 3, h, w), jnp.float32)
    co = jax.random.normal(jax.random.PRNGKey(2), img.shape)
    coef, flags = _family(jax.random.PRNGKey(0), s, h, w, p=0.5)
    n = int((np.asarray(flags) > 0).sum())
    assert 0 < n < s
    for budget in (min(n + 2, s - 1),     # compact branch taken
                   max(n - 1, 1)):        # overflow -> full fallback
        out = jax.jit(lambda x: perspective_warp_compact(
            x, coef, flags, budget=budget))(img)
        ref = jax.jit(perspective_warp)(img, coef, flags)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        g1 = jax.jit(jax.grad(lambda x: jnp.sum(perspective_warp_compact(
            x, coef, flags, budget=budget) * co)))(img)
        g2 = jax.jit(jax.grad(lambda x: jnp.sum(
            perspective_warp(x, coef, flags) * co)))(img)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5)


def test_compact_default_budget():
    from aphantasia_tpu.ops.pallas_persp import default_budget
    assert default_budget(200) == 72      # 40 + 4.2*5.66 + 2 -> 8-aligned
    assert default_budget(8) == 8         # tiny batches: no compaction win
