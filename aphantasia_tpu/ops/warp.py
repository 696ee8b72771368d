"""Differentiable warping primitives: bilinear sampling, affine / homography.

Equivalents of the torch ops the reference leans on — `F.grid_sample`
(depth/depth.py:57,62), `torchvision.transforms.functional.affine`
(illustrip.py:130-138, transforms.py:73-83) — implemented once as batched,
jittable gather kernels.  The core samples in *pixel index* space; normalized
wrappers reproduce torch's align_corners conventions bit-for-bit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reflect(x, lo, hi):
    """Reflect coords into [lo, hi] (torch 'reflection', align_corners=True)."""
    rng = hi - lo
    x = jnp.abs(x - lo) % (2 * rng)
    return hi - jnp.abs(x - rng)


def sample_px(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
              padding: str = "zeros", fill: float = 0.0) -> jnp.ndarray:
    """Bilinear sample at pixel coords.

    img    : [B,C,H,W]
    ix, iy : [B,Ho,Wo] float pixel indices
    padding: 'zeros' | 'border' | 'reflection'
    """
    b, c, h, w = img.shape
    if padding == "reflection":
        ix = _reflect(ix, 0.0, w - 1.0)
        iy = _reflect(iy, 0.0, h - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0

    def tap(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = (yc * w + xc).reshape(b, 1, -1)
        vals = jnp.take_along_axis(img.reshape(b, c, h * w), flat, axis=2)
        vals = vals.reshape(b, c, *xi.shape[1:])
        if padding == "zeros":
            vals = jnp.where(inb[:, None], vals, fill)
        return vals

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    txe = tx[:, None]
    tye = ty[:, None]
    return (v00 * (1 - txe) * (1 - tye) + v01 * txe * (1 - tye)
            + v10 * (1 - txe) * tye + v11 * txe * tye)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, padding: str = "zeros",
                align_corners: bool = True, fill: float = 0.0) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear).

    img  : [C,H,W] or [B,C,H,W];  grid : [Ho,Wo,2] or [B,Ho,Wo,2], xy in [-1,1].
    """
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    if grid.ndim == 3:
        grid = jnp.broadcast_to(grid, (img.shape[0],) + grid.shape)
    h, w = img.shape[-2:]
    if align_corners:
        ix = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
        iy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
        iy = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    out = sample_px(img, ix, iy, padding=padding, fill=fill)
    return out if batched else out[0]


def base_grid(h: int, w: int) -> jnp.ndarray:
    """Identity grid [h,w,2], xy in [-1,1] (align_corners=True spacing)."""
    yy = jnp.linspace(-1.0, 1.0, h)
    xx = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def inverse_affine_px(angle_deg, translate, scale, shear_deg):
    """torchvision `_get_inverse_affine_matrix` with center=(0,0), shear_y=0.

    Returns (inv [2,2], t [2]) such that src_centered = inv @ (dst_centered - t)
    in centered pixel coordinates.
    """
    rot = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    sx = jnp.deg2rad(jnp.asarray(shear_deg, jnp.float32))
    a = jnp.cos(rot)
    b = -jnp.cos(rot) * jnp.tan(sx) - jnp.sin(rot)
    c = jnp.sin(rot)
    d = -jnp.sin(rot) * jnp.tan(sx) + jnp.cos(rot)
    scale = jnp.asarray(scale, jnp.float32)
    inv = jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) / scale
    t = jnp.asarray(translate, jnp.float32)
    return inv, t


def tv_affine(img: jnp.ndarray, angle_deg, translate=(0.0, 0.0), scale=1.0,
              shear_deg=0.0, fill: float = 0.0) -> jnp.ndarray:
    """`torchvision.transforms.functional.affine` (tensor path, bilinear,
    constant fill) — rotation about center, translate in pixels, x-shear.

    img: [B,C,H,W] (or [C,H,W]); broadcasting over per-sample scalar params
    is handled by vmapping this function.
    """
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    b, c, h, w = img.shape
    inv, t = inverse_affine_px(angle_deg, translate, scale, shear_deg)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dx = gx - t[0]
    dy = gy - t[1]
    sx = inv[0, 0] * dx + inv[0, 1] * dy + cx
    sy = inv[1, 0] * dx + inv[1, 1] * dy + cy
    sx = jnp.broadcast_to(sx, (b,) + sx.shape)
    sy = jnp.broadcast_to(sy, (b,) + sy.shape)
    out = sample_px(img, sx, sy, padding="zeros", fill=fill)
    return out if batched else out[0]


def homography_grid(mat3: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """3x3 inverse homography in pixel coords -> pixel sampling coords.

    Returns (ix, iy) each [h,w]."""
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1)
    src = jnp.einsum("ij,hwj->hwi", mat3, pts)
    return src[..., 0] / (src[..., 2] + 1e-8), src[..., 1] / (src[..., 2] + 1e-8)


def frame_transform(img: jnp.ndarray, size, angle, shift, scale, shear) -> jnp.ndarray:
    """Per-frame motion transform (reference illustrip.py:130-138):
    torchvision-affine (bilinear, zero fill); the reference's follow-up
    center-crop is an identity for size-preserving warps."""
    return tv_affine(img, angle, (shift[0], shift[1]), scale, shear)
