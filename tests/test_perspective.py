"""Exact homography warp vs a torch write-out of torchvision's algorithm.

The oracle reimplements torchvision's tensor path for
`F.perspective` / `F.affine` (RandomPerspective / random_rotate_fast,
reference aphantasia/transforms.py:165-170) with torch.nn.functional
`grid_sample` doing the actual interpolation — so the 4-tap bilinear,
zeros padding, align_corners=False coordinates, and the fill=0 mask
blending are all bound to torch's real numerics, not to our own reading
of them.  Value parity is asserted on WHITE NOISE (point-exactness, no
smoothness to hide behind) at <=1e-3 (VERDICT r1 item 3's bar; actual
agreement is ~1e-6), and the custom scatter-free VJP is asserted against
torch autograd THROUGH grid_sample — which also proves the backward
gather window (_BWD_RADIUS) is sufficient at full distortion 0.33.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.perspective import (
    perspective_endpoints, perspective_coeffs, rotation_coeffs_for,
    homography_warp)

pytestmark = pytest.mark.slow


def _torch_coeffs(startpoints, endpoints):
    """torchvision _get_perspective_coeffs (float64 lstsq, float32 out)."""
    import torch
    a = torch.zeros(8, 8, dtype=torch.float64)
    for i, (p1, p2) in enumerate(zip(endpoints, startpoints)):
        a[2 * i, :] = torch.tensor(
            [p1[0], p1[1], 1, 0, 0, 0, -p2[0] * p1[0], -p2[0] * p1[1]],
            dtype=torch.float64)
        a[2 * i + 1, :] = torch.tensor(
            [0, 0, 0, p1[0], p1[1], 1, -p2[1] * p1[0], -p2[1] * p1[1]],
            dtype=torch.float64)
    b = torch.tensor(startpoints, dtype=torch.float64).view(8)
    res = torch.linalg.lstsq(a, b).solution
    return res.to(torch.float32)


def _torch_perspective(img, coeffs):
    """torchvision F_t.perspective with fill=0 (grid over pixel centers,
    grid_sample bilinear/zeros/align_corners=False, ones-channel mask)."""
    import torch
    s, c, oh, ow = img.shape
    theta1 = torch.tensor([[coeffs[0], coeffs[1], coeffs[2]],
                           [coeffs[3], coeffs[4], coeffs[5]]],
                          dtype=torch.float32)
    theta2 = torch.tensor([[coeffs[6], coeffs[7], 1.0],
                           [coeffs[6], coeffs[7], 1.0]], dtype=torch.float32)
    d = 0.5
    base = torch.empty(1, oh, ow, 3)
    x_grid = torch.linspace(d, ow * 1.0 + d - 1.0, steps=ow)
    base[..., 0].copy_(x_grid)
    y_grid = torch.linspace(d, oh * 1.0 + d - 1.0, steps=oh).unsqueeze_(-1)
    base[..., 1].copy_(y_grid)
    base[..., 2].fill_(1)
    rescaled1 = theta1.transpose(0, 1) / torch.tensor([0.5 * ow, 0.5 * oh])
    og1 = base.view(1, oh * ow, 3).bmm(rescaled1[None])
    og2 = base.view(1, oh * ow, 3).bmm(theta2.transpose(0, 1)[None])
    grid = (og1 / og2 - 1.0).view(1, oh, ow, 2).expand(s, oh, ow, 2)
    mask = torch.ones(s, 1, oh, ow, dtype=img.dtype)
    inp = torch.cat([img, mask], dim=1)
    out = torch.nn.functional.grid_sample(
        inp, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    m = out[:, -1:]
    return out[:, :-1] * m     # fill = 0


def _torch_rotate(img, angle_deg):
    """torchvision random_rotate_fast: F.affine(angle, fill=0) tensor path
    (_gen_affine_grid over CENTERED pixel centers + same grid transform)."""
    import torch
    import math
    s, c, oh, ow = img.shape
    rot = math.radians(angle_deg)
    # _get_inverse_affine_matrix(center=[0,0], angle, translate=0, scale=1,
    # shear=0): inverse rotation matrix
    a, b = math.cos(rot), math.sin(rot)
    theta = torch.tensor([[a, b, 0.0], [-b, a, 0.0]], dtype=torch.float32)
    d = 0.5
    base = torch.empty(1, oh, ow, 3)
    x_grid = torch.linspace(-ow * 0.5 + d, ow * 0.5 + d - 1, steps=ow)
    base[..., 0].copy_(x_grid)
    y_grid = torch.linspace(-oh * 0.5 + d, oh * 0.5 + d - 1,
                            steps=oh).unsqueeze_(-1)
    base[..., 1].copy_(y_grid)
    base[..., 2].fill_(1)
    rescaled = theta.transpose(0, 1) / torch.tensor([0.5 * ow, 0.5 * oh])
    grid = base.view(1, oh * ow, 3).bmm(rescaled[None]).view(1, oh, ow, 2)
    grid = grid.expand(s, oh, ow, 2)
    mask = torch.ones(s, 1, oh, ow, dtype=img.dtype)
    inp = torch.cat([img, mask], dim=1)
    out = torch.nn.functional.grid_sample(
        inp, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    return out[:, :-1] * out[:, -1:]


def _random_endpoints(rng, h, w, distortion=0.33):
    half_h, half_w = h // 2, w // 2
    dw, dh = int(distortion * half_w), int(distortion * half_h)
    tl = [rng.randint(0, dw + 1), rng.randint(0, dh + 1)]
    tr = [rng.randint(w - dw - 1, w), rng.randint(0, dh + 1)]
    br = [rng.randint(w - dw - 1, w), rng.randint(h - dh - 1, h)]
    bl = [rng.randint(0, dw + 1), rng.randint(h - dh - 1, h)]
    start = [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]]
    return start, [tl, tr, br, bl]


def test_coeffs_match_torchvision_solve():
    pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    h = w = 64
    start, end = _random_endpoints(rng, h, w)
    want = _torch_coeffs(start, end).numpy()
    got = np.asarray(perspective_coeffs(
        jnp.asarray(start, jnp.float32),
        jnp.asarray(end, jnp.float32)[None]))[0]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_perspective_value_parity_white_noise():
    """<=1e-3 max deviation vs torchvision semantics at distortion 0.33 —
    asserted on white noise so only point-exact sampling can pass."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    h = w = 64
    img = rng.rand(2, 3, h, w).astype(np.float32)
    worst = 0.0
    for trial in range(6):
        start, end = _random_endpoints(rng, h, w)
        coeffs = _torch_coeffs(start, end)
        want = _torch_perspective(torch.from_numpy(img), coeffs).numpy()
        got = np.asarray(homography_warp(
            jnp.asarray(img), jnp.asarray(coeffs.numpy())[None].repeat(2, 0)))
        worst = max(worst, float(np.abs(got - want).max()))
    assert worst <= 1e-3, worst
    # actual agreement is point-exact up to fp32 roundoff
    assert worst <= 1e-4, worst


def test_rotation_value_parity():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    h = w = 48
    img = rng.rand(1, 3, h, w).astype(np.float32)
    for angle in (-29.0, -7.0, 0.0, 13.0, 30.0):
        want = _torch_rotate(torch.from_numpy(img), angle).numpy()
        coef = rotation_coeffs_for(jnp.asarray([angle], jnp.float32), h, w)
        got = np.asarray(homography_warp(jnp.asarray(img), coef))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gradient_matches_torch_autograd():
    """Scatter-free VJP vs torch autograd through grid_sample — also
    proves the backward window radius covers distortion 0.33."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    h = w = 48
    img = rng.rand(1, 3, h, w).astype(np.float32)
    cot = rng.rand(1, 3, h, w).astype(np.float32)
    for trial in range(4):
        start, end = _random_endpoints(rng, h, w)
        coeffs = _torch_coeffs(start, end)

        t_img = torch.from_numpy(img).requires_grad_(True)
        out = _torch_perspective(t_img, coeffs)
        out.backward(torch.from_numpy(cot))
        want = t_img.grad.numpy()

        cj = jnp.asarray(coeffs.numpy())[None]
        _, vjp = jax.vjp(lambda x: homography_warp(x, cj), jnp.asarray(img))
        got = np.asarray(vjp(jnp.asarray(cot))[0])
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_gradient_rotation():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    h = w = 40
    img = rng.rand(1, 3, h, w).astype(np.float32)
    cot = rng.rand(1, 3, h, w).astype(np.float32)
    for angle in (-30.0, 17.0):
        t_img = torch.from_numpy(img).requires_grad_(True)
        out = _torch_rotate(t_img, angle)
        out.backward(torch.from_numpy(cot))
        want = t_img.grad.numpy()

        coef = rotation_coeffs_for(jnp.asarray([angle], jnp.float32), h, w)
        _, vjp = jax.vjp(lambda x: homography_warp(x, coef), jnp.asarray(img))
        got = np.asarray(vjp(jnp.asarray(cot))[0])
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_endpoints_distribution():
    """perspective_endpoints draws integer displacements in torchvision's
    randint bounds and applies with prob p."""
    h = w = 64
    start, end = perspective_endpoints(jax.random.PRNGKey(0), 512, h, w,
                                       distortion=0.33, p=0.5)
    end = np.asarray(end)
    dw = int(0.33 * (w // 2))
    # integer-valued
    assert np.allclose(end, np.round(end))
    # identity fraction ~ 1-p
    ident = (end == np.asarray(start)[None]).all(axis=(1, 2)).mean()
    assert 0.35 < ident < 0.65, ident
    # displaced corners stay inside torchvision bounds
    assert end[:, 0, 0].max() <= dw and end[:, 0, 0].min() >= 0
    assert end[:, 1, 0].min() >= w - dw - 1 and end[:, 1, 0].max() <= w - 1
