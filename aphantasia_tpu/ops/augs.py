"""Batched augmentation pipelines for cutouts.

Parity targets: reference aphantasia/transforms.py pipelines —
`transforms_fast` (RandomPerspective(0.33, p=0.2) + RandomErasing(0.2) +
rotate(±30°, 20x zero-weighted) + CLIP normalize, transforms.py:165-170),
`transforms_custom` (pad+rotate+jitter+normalize, :156-163) and
`transforms_elastic` (:147-154).

Re-architected TPU-first: the reference applies torchvision transforms to
each cutout tensor separately inside a Python loop; here every random
parameter is drawn as an [S]-array under a threaded PRNG key and the
geometric ops collapse into ONE composed per-sample homography + a single
bilinear gather (erasing is a masked fill).  Augmentations are random, so
parity is distributional, not bitwise; geometric warp composition is noted
where it reorders ops relative to the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.warp import sample_px, inverse_affine_px
from aphantasia_tpu.params.color import clip_normalize

# rotate angle choices: list(range(-30, 30)) + 20*[0] (transforms.py:168)
_ROT_ANGLES = np.asarray(list(range(-30, 30)) + [0] * 20, dtype=np.float32)


def _rotation_h3(angles_deg):
    """[S] angles -> [S,3,3] inverse homographies in absolute pixel coords
    (rotation about the canvas center happens in the caller via centering)."""
    rot = jnp.deg2rad(angles_deg)
    cos, sin = jnp.cos(rot), jnp.sin(rot)
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    # inverse rotation (sample src at R^-1 dst)
    return jnp.stack([
        jnp.stack([cos, sin, zeros], -1),
        jnp.stack([-sin, cos, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)


def _center_conjugate(h3, h, w):
    """Conjugate pixel-space homography with centering translate."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    t = jnp.asarray([[1, 0, cx], [0, 1, cy], [0, 0, 1]], jnp.float32)
    ti = jnp.asarray([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], jnp.float32)
    return t @ h3 @ ti if h3.ndim == 2 else jnp.einsum(
        "ij,sjk,kl->sil", t, h3, ti)


def _solve_homography(src_pts, dst_pts):
    """Per-sample H (3x3, h33=1) with src = H @ dst: torchvision
    `_get_perspective_coeffs` linear system.  src/dst: [S,4,2]."""
    s = src_pts.shape[0]
    rows = []
    rhs = []
    for i in range(4):
        dx, dy = dst_pts[:, i, 0], dst_pts[:, i, 1]
        sx, sy = src_pts[:, i, 0], src_pts[:, i, 1]
        z = jnp.zeros_like(dx)
        o = jnp.ones_like(dx)
        rows.append(jnp.stack([dx, dy, o, z, z, z, -sx * dx, -sx * dy], -1))
        rows.append(jnp.stack([z, z, z, dx, dy, o, -sy * dx, -sy * dy], -1))
        rhs.extend([sx, sy])
    a = jnp.stack(rows, -2)                      # [S,8,8]
    b = jnp.stack(rhs, -1)                       # [S,8]
    coef = jnp.linalg.solve(a, b[..., None])[..., 0]
    h3 = jnp.concatenate([coef, jnp.ones((s, 1))], -1).reshape(s, 3, 3)
    return h3


def random_perspective_h3(key, s, h, w, distortion=0.33, p=0.2):
    """torchvision RandomPerspective params -> [S,3,3] inverse homographies.

    Corners displaced inward by U{0..distortion*half}; identity with prob 1-p.
    """
    k_apply, k_pts = jax.random.split(key)
    half_h = distortion * h // 2
    half_w = distortion * w // 2
    d = jax.random.uniform(k_pts, (s, 4, 2))
    # inward displacement per corner: tl, tr, br, bl
    disp = jnp.stack([
        jnp.stack([d[:, 0, 0] * half_w, d[:, 0, 1] * half_h], -1),
        jnp.stack([-d[:, 1, 0] * half_w, d[:, 1, 1] * half_h], -1),
        jnp.stack([-d[:, 2, 0] * half_w, -d[:, 2, 1] * half_h], -1),
        jnp.stack([d[:, 3, 0] * half_w, -d[:, 3, 1] * half_h], -1),
    ], 1)
    corners = jnp.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                          jnp.float32)[None]
    startpoints = jnp.broadcast_to(corners, (s, 4, 2))
    endpoints = startpoints + disp
    h3 = _solve_homography(startpoints, endpoints)   # sample src=start at dst=end
    apply = jax.random.uniform(k_apply, (s,)) < p
    eye = jnp.broadcast_to(jnp.eye(3), (s, 3, 3))
    return jnp.where(apply[:, None, None], h3, eye)


def warp_by_h3(cuts, h3, fill=0.0):
    """Apply per-sample pixel-space homographies with one bilinear gather."""
    s, c, h, w = cuts.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)          # [h,w,3]
    src = jnp.einsum("sij,hwj->shwi", h3, pts)
    ix = src[..., 0] / (src[..., 2] + 1e-8)
    iy = src[..., 1] / (src[..., 2] + 1e-8)
    return sample_px(cuts, ix, iy, padding="zeros", fill=fill)


def random_erasing(key, cuts, p=0.2, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                   value=0.0):
    """torchvision RandomErasing: random rect set to `value` with prob p."""
    s, c, h, w = cuts.shape
    ks = jax.random.split(key, 5)
    apply = jax.random.uniform(ks[0], (s,)) < p
    area = jax.random.uniform(ks[1], (s,), minval=scale[0], maxval=scale[1]) * h * w
    logr = jax.random.uniform(ks[2], (s,), minval=np.log(ratio[0]),
                              maxval=np.log(ratio[1]))
    r = jnp.exp(logr)
    eh = jnp.clip(jnp.sqrt(area * r), 1, h - 1)
    ew = jnp.clip(jnp.sqrt(area / r), 1, w - 1)
    y0 = jax.random.uniform(ks[3], (s,)) * (h - eh)
    x0 = jax.random.uniform(ks[4], (s,)) * (w - ew)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
              & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    mask = inside & apply[:, None, None]
    return jnp.where(mask[:, None], value, cuts)


def random_rotate_h3(key, s, h, w, angles=_ROT_ANGLES):
    idx = jax.random.randint(key, (s,), 0, len(angles))
    a = jnp.asarray(angles)[idx]
    return _center_conjugate(_rotation_h3(a), h, w)


def _jitter_translate_h3(key, s, d):
    """jitter(d): integer translate dx,dy in {0..d-1} (transforms.py:27-33)."""
    dxy = jax.random.randint(key, (s, 2), 0, d).astype(jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3), (s, 3, 3))
    # inverse translate: src = dst - t
    return eye.at[:, 0, 2].set(-dxy[:, 0]).at[:, 1, 2].set(-dxy[:, 1])


def transforms_fast(key, cuts):
    """perspective(0.33,p=0.2) ∘ rotate(±30°,20x0) composed into one warp,
    then erasing(p=0.2), then CLIP normalize (transforms.py:165-170; warps
    fused — erasing commutes distributionally with the rotation)."""
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    h3 = jnp.einsum("sij,sjk->sik",
                    random_perspective_h3(k1, s, h, w),
                    random_rotate_h3(k2, s, h, w))
    cuts = warp_by_h3(cuts, h3)
    cuts = random_erasing(k3, cuts)
    return clip_normalize(cuts)


def transforms_custom(key, cuts):
    """pad(4, gray) + rotate + jitter(8) + normalize (transforms.py:156-163).

    The gray border is emulated by a slight scale-down inside the composed
    warp with 0.5 fill (the reference pads to size+8 and lets CLIP's conv
    truncate the excess)."""
    s, c, h, w = cuts.shape
    k1, k2 = jax.random.split(key)
    pad_scale = h / (h + 8.0)
    scale_h3 = jnp.eye(3) / pad_scale
    scale_h3 = scale_h3.at[2, 2].set(1.0)
    rot = random_rotate_h3(k1, s, h, w)
    jit = _jitter_translate_h3(k2, s, 8)
    h3 = jnp.einsum("sij,sjk,kl->sil", jit, rot,
                    _center_conjugate(scale_h3, h, w))
    cuts = warp_by_h3(cuts, h3, fill=0.5)
    return clip_normalize(cuts)


def transforms_elastic(key, cuts):
    """pad + erasing + rotate + elastic + jitter + normalize
    (transforms.py:147-154).  NOTE: the reference passes a zero noise field to
    kornia's elastic_transform2d — an identity warp; we implement a real
    smooth random displacement instead (known-bug list, SURVEY.md §7)."""
    s, c, h, w = cuts.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rot = random_rotate_h3(k1, s, h, w)
    jit = _jitter_translate_h3(k2, s, 8)
    h3 = jnp.einsum("sij,sjk->sik", jit, rot)
    cuts = warp_by_h3(cuts, h3, fill=0.5)
    cuts = random_erasing(k3, cuts)
    # coarse smooth displacement field, ~kornia alpha in [0,1) normalized units
    ka, kf = jax.random.split(k4)
    alpha = jax.random.uniform(ka, (s, 2, 1, 1)) * 0.5
    coarse = jax.random.uniform(kf, (s, 2, 9, 9), minval=-1.0, maxval=1.0)
    disp = jax.image.resize(coarse, (s, 2, h, w), "bilinear") * alpha
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ix = gx[None] + disp[:, 0] * (w - 1) * 0.5
    iy = gy[None] + disp[:, 1] * (h - 1) * 0.5
    cuts = sample_px(cuts, ix, iy, padding="border")
    return clip_normalize(cuts)


def normalize_only(key, cuts):
    del key
    return clip_normalize(cuts)


def get_transform(name: str):
    """'fast' | 'custom' | 'elastic' | 'none' -> fn(key, cuts)
    (selection logic parity: clip_fft.py:161-171)."""
    return {
        "fast": transforms_fast,
        "custom": transforms_custom,
        "elastic": transforms_elastic,
        "none": normalize_only,
    }[name]
