"""Bicubic interpolation weights matching torch `F.interpolate(mode='bicubic',
align_corners=True)` — the resize the reference uses for every cutout
(aphantasia/utils.py:249) and frame resize (depth/depth.py:41-42).

XLA's `jax.image.resize` uses Keys a=-0.5 half-pixel cubic, which does NOT
match torch (cubic convolution A=-0.75, align_corners source mapping), so we
compute tap indices + weights ourselves.  The weights feed either a dense
interpolation-matrix matmul (MXU path, see ops/sampler.py) or a gather.
"""
from __future__ import annotations

import jax.numpy as jnp

_A = -0.75  # torch's cubic convolution alpha (aten/native UpSample.h)


def _cc1(x):
    # |x| <= 1 branch: ((A+2)|x| - (A+3))|x|^2 + 1
    return ((_A + 2.0) * x - (_A + 3.0)) * x * x + 1.0


def _cc2(x):
    # 1 < |x| < 2 branch: ((A|x| - 5A)|x| + 8A)|x| - 4A
    return ((_A * x - 5.0 * _A) * x + 8.0 * _A) * x - 4.0 * _A


def cubic_tap_weights(t: jnp.ndarray) -> jnp.ndarray:
    """Weights for the 4 taps [floor-1, floor, floor+1, floor+2] at fractional
    offset t in [0,1).  Returns shape t.shape + (4,); rows sum to 1."""
    return jnp.stack([_cc2(t + 1.0), _cc1(t), _cc1(1.0 - t), _cc2(2.0 - t)], axis=-1)


def resize_axis_taps(out_size: int, in_size, offset=0.0):
    """Tap indices and weights for one axis with align_corners=True.

    src = offset + i * (in_size - 1) / (out_size - 1).  `in_size` (and
    `offset`) may be traced scalars (dynamic crop sizes); `out_size` is
    static.  Tap indices are clamped to [0, in_size-1] exactly as torch's
    upsample_bicubic2d clamps accesses at the borders.

    Returns (idx int32 [..., out_size, 4], w float32 [..., out_size, 4]).
    Broadcasts over leading dims of `in_size`/`offset` (e.g. per-sample).
    """
    in_size = jnp.asarray(in_size, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    i = jnp.arange(out_size, dtype=jnp.float32)
    step = (in_size - 1.0) / max(out_size - 1, 1)
    src = i * step[..., None] if step.ndim else i * step
    y0 = jnp.floor(src)
    t = src - y0
    w = cubic_tap_weights(t)
    taps = y0[..., None] + jnp.arange(-1, 3, dtype=jnp.float32)
    hi = (in_size - 1.0)[..., None, None] if in_size.ndim else in_size - 1.0
    taps = jnp.clip(taps, 0.0, hi)
    idx = taps.astype(jnp.int32) + (
        offset[..., None, None].astype(jnp.int32) if offset.ndim else jnp.int32(offset))
    return idx, w


def linear_axis_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """Dense [out, in] bilinear interpolation matrix with
    align_corners=True (src = i * (in-1)/(out-1)) — torch
    `F.interpolate(mode='bilinear', align_corners=True)` parity (the DPT
    fusion/head resizes: reference depth/any2/util/blocks.py, HF
    DepthAnythingFeatureFusionLayer)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = i * ((in_size - 1.0) / max(out_size - 1, 1))
    y0 = jnp.floor(src)
    t = src - y0
    w = jnp.stack([1.0 - t, t], axis=-1)                       # [out, 2]
    idx = jnp.clip(y0[:, None] + jnp.arange(2, dtype=jnp.float32),
                   0.0, in_size - 1.0).astype(jnp.int32)
    return _dense_matrix(idx, w, in_size)


def resize_axis_taps_halfpix(out_size: int, in_size: int):
    """Tap indices/weights for one axis with align_corners=False (the
    half-pixel mapping `src = (i + 0.5) * in/out - 0.5`), torch cubic
    A=-0.75, NO antialias — exactly `F.interpolate(mode='bicubic',
    align_corners=False)` (what HF Dinov2 and the reference's vendored
    net use for position-embedding interpolation, depth/any2/dinov2.py).
    Static sizes only.  Returns (idx int32 [out,4], w float32 [out,4])."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = (i + 0.5) * (in_size / out_size) - 0.5
    y0 = jnp.floor(src)
    t = src - y0
    w = cubic_tap_weights(t)
    taps = y0[:, None] + jnp.arange(-1, 3, dtype=jnp.float32)
    idx = jnp.clip(taps, 0.0, in_size - 1.0).astype(jnp.int32)
    return idx, w


def resize_bicubic_halfpix(img: jnp.ndarray, size) -> jnp.ndarray:
    """Full-frame bicubic resize, NCHW (or leading-dims) + [..., H, W],
    align_corners=False, no antialias — torch `F.interpolate(...,
    mode='bicubic', align_corners=False)` parity for static shapes."""
    h, w = img.shape[-2:]
    oh, ow = size
    yidx, yw = resize_axis_taps_halfpix(oh, h)
    xidx, xw = resize_axis_taps_halfpix(ow, w)
    wy = _dense_matrix(yidx, yw, h)    # [oh, h]
    wx = _dense_matrix(xidx, xw, w)    # [ow, w]
    out = jnp.einsum("oh,...hw->...ow", wy, img)
    return jnp.einsum("pw,...ow->...op", wx, out)


def resize_bicubic(img: jnp.ndarray, size) -> jnp.ndarray:
    """Plain full-frame bicubic resize, NCHW, align_corners=True semantics.

    Equivalent of `F.interpolate(img, size, mode='bicubic',
    align_corners=True)` (reference depth/depth.py:41-42, clip_fft.py:222).
    Implemented as two dense interpolation-matrix matmuls (MXU-friendly).
    """
    h, w = img.shape[-2:]
    oh, ow = size
    yidx, yw = resize_axis_taps(oh, h)
    xidx, xw = resize_axis_taps(ow, w)
    wy = _dense_matrix(yidx, yw, h)    # [oh, h]
    wx = _dense_matrix(xidx, xw, w)    # [ow, w]
    out = jnp.einsum("oh,...hw->...ow", wy, img)
    return jnp.einsum("pw,...ow->...op", wx, out)


def _dense_matrix(idx: jnp.ndarray, w: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """Scatter tap weights [out,4] into a dense [out, in_size] matrix."""
    out_size = idx.shape[0]
    mat = jnp.zeros((out_size, in_size), dtype=w.dtype)
    rows = jnp.broadcast_to(jnp.arange(out_size)[:, None], idx.shape)
    return mat.at[rows, idx].add(w)
