"""Depth-driven 3D grid warp (reference depth/depth.py:33-84) + frame
advance for video modes.

Per frame: blur-lerped frame -> resize to 518-on-short-side (multiple of 14)
-> depth inference fused with the mirrored estimate
(`depth * flip(depth(flip(img)))`, depth.py:75) -> resize back -> displace
the sampling grid toward/away from a moving origin proportionally to
depth x strength, plus a second lens-distortion pass (depth.py:44-64).
These run once per frame (not per cutout), so the gather-based grid_sample
is acceptable here.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.warp import grid_sample, base_grid
from aphantasia_tpu.ops.resize import resize_bicubic


def triangle_blur(x: jnp.ndarray, kernel_size: int = 3, pow: float = 1.0):
    """Separable triangle blur (reference utils.py:137-147)."""
    padding = (kernel_size - 1) // 2
    b, c, h, w = x.shape
    k = jnp.abs(jnp.linspace(-1, 1, kernel_size + 2)[1:-1])
    k = ((1.0 - k) ** pow)
    k = k / k.sum()
    xx = x.reshape(b * c, 1, h, w)
    xx = jnp.pad(xx, ((0, 0), (0, 0), (padding, padding), (padding, padding)),
                 mode="reflect")
    kx = k.reshape(1, 1, 1, kernel_size)
    xx = jax.lax.conv_general_dilated(
        xx, jnp.transpose(kx, (2, 3, 1, 0)), (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    ky = k.reshape(1, 1, kernel_size, 1)
    xx = jax.lax.conv_general_dilated(
        xx, jnp.transpose(ky, (2, 3, 1, 0)), (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return xx.reshape(b, c, h, w)


def grid_warp(img: jnp.ndarray, depth: jnp.ndarray, strength, centre,
              midpoint, dlens: float = 0.05) -> jnp.ndarray:
    """Depth-displaced sampling + lens distortion (depth/depth.py:44-64).

    img   : [1,C,H,W];  depth : [1,H,W] in [0,1]
    centre: [2] (dX, dY) origin in [-1,1];  midpoint scalar (dZ)."""
    h, w = img.shape[-2:]
    grid = base_grid(h, w)                                  # [h,w,2] xy
    d = jnp.asarray(centre, jnp.float32) - grid             # [h,w,2]
    d_sum = depth[0]
    d_sum = d_sum - jnp.max(d_sum) * midpoint
    warped = grid + d * d_sum[..., None] * strength
    img = grid_sample(img, warped[None], padding="reflection")
    lens = jnp.sqrt(jnp.sum(d ** 2, axis=-1))
    warped = grid + d * lens[..., None] * strength * dlens
    img = grid_sample(img, warped[None], padding="reflection")
    return img


def depth_dims(size):
    """518-on-short-side, multiple-of-14 DA-V2 inference dims
    (depth/depth.py:70-72)."""
    h, w = size
    res = 518
    dim = [res, int(res * w / h)] if h < w else [int(res * h / w), res]
    return tuple(x - x % 14 for x in dim)


def depth_preview(rgb, size):
    """Blur-lerped, inference-sized preview of a [0,1] RGB frame
    (depth/depth.py:74)."""
    return resize_bicubic(rgb + 0.5 * (triangle_blur(rgb, 5, 2.0) - rgb),
                          depth_dims(size))


def mirror_fused_depth(infer_any, preview):
    """The mirror-fused estimate `d * flip(d(flip(img)))` (depth.py:75) as
    ONE batched forward: the preview and its flip ride the same DA-V2
    dispatch (per-sample minmax in InferDepthAny keeps the numerics
    identical to two separate calls).  Returns [1,1,hd,wd]."""
    pair = infer_any(jnp.concatenate([preview, jnp.flip(preview, -1)],
                                     axis=0))
    return pair[0:1] * jnp.flip(pair[1:2], -1)


def depthwarp(img_t, img, infer_any, strength=0.0, centre=(0.0, 0.0),
              midpoint=0.5, save_path=None, save_num=0, dlens=0.05):
    """Full per-frame depth warp (depth/depth.py:66-84).

    Library/parity surface: the illustrip CLI runs these pieces split
    across its fused frame program + one DA-V2 dispatch (parallel/step.py
    build_frame_step / build_depth_helpers, built from the shared helpers
    above); this whole-op form serves scripting users and the parity tests.

    img_t: the parameter-space frame to warp; img: its [0,1] RGB preview."""
    h, w = img.shape[-2:]
    depth = mirror_fused_depth(infer_any, depth_preview(img, (h, w)))
    depth = resize_bicubic(depth, (h, w))

    if save_path is not None:
        from aphantasia_tpu.io.media import img_save
        arr = np.asarray(depth[0, 0])
        img_save(os.path.join(save_path, "%05d.jpg" % save_num),
                 np.stack([arr] * 3, -1))

    return grid_warp(img_t, depth[0], strength,
                     jnp.asarray(centre, jnp.float32), midpoint, dlens)


def depth_transform(img_t, deptha, depthX=0.0, scale=1.0, shift=(0, 0),
                    colors=1.0, depth_dir=None, save_num=0):
    """Motion-schedule -> warp-origin mapping (illustrip.py:115-128):
    dX/dY from pixel shift; dZ = 0.5 + 32*(scale-1)."""
    from aphantasia_tpu.params.color import to_valid_rgb
    if not isinstance(scale, float):
        scale = float(np.asarray(scale).ravel()[0])
    size = img_t.shape[-2:]
    dx = 100.0 * float(shift[0]) / size[1]
    dy = 100.0 * float(shift[1]) / size[0]
    dz = 0.5 + 32.0 * (scale - 1.0)
    img = to_valid_rgb(img_t, colors=colors)
    return depthwarp(img_t, img, deptha, float(depthX), (dx, dy), dz,
                     save_path=depth_dir, save_num=save_num)
