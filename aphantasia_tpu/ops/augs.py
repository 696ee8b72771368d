"""Batched augmentation pipelines for cutouts — gather-free TPU hot path.

Parity targets: reference aphantasia/transforms.py pipelines —
`transforms_fast` (RandomPerspective(0.33, p=0.2) + RandomErasing(0.2) +
rotate(±30°, 20x zero-weighted) + CLIP normalize, transforms.py:165-170),
`transforms_custom` (pad+rotate+jitter+normalize, :156-163) and
`transforms_elastic` (:147-154).

Re-architected TPU-first: the reference applies torchvision transforms per
cutout in a Python loop; here every random parameter is an [S]-array under a
threaded PRNG key, and all geometric ops collapse into ONE per-sample
affine applied by the separable LDU warp (ops/sep_warp.py — FFT-phase
shears + scale matmuls, no gathers: XLA TPU gathers made the step ~4s; this
path is ~two orders faster).  Deviations (documented): the mild perspective
(distortion 0.33) is applied as its least-squares affine fit; erasing
commutes with the warp; 'elastic' uses real smooth separable displacements
(the reference passes a zero noise field to kornia — an identity warp,
known-bug list SURVEY.md §7).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.sep_warp import affine_warp, fractional_shift
from aphantasia_tpu.params.color import clip_normalize

# rotate angle choices: list(range(-30, 30)) + 20*[0] (transforms.py:168)
_ROT_ANGLES = np.asarray(list(range(-30, 30)) + [0] * 20, dtype=np.float32)


def _rot_a2(angles_deg):
    """[S] -> [S,2,2] inverse rotation (centered coords)."""
    r = jnp.deg2rad(angles_deg)
    cos, sin = jnp.cos(r), jnp.sin(r)
    return jnp.stack([jnp.stack([cos, sin], -1),
                      jnp.stack([-sin, cos], -1)], -2)


def _fit_affine(dst_pts, src_pts):
    """Per-sample least-squares affine src ~= A2 @ dst + t.

    dst_pts/src_pts: [S,4,2] (centered pixel coords).  Returns [S,2,3]."""
    ones = jnp.ones(dst_pts.shape[:-1] + (1,))
    x = jnp.concatenate([dst_pts, ones], -1)                  # [S,4,3]
    xtx = jnp.einsum("spi,spj->sij", x, x)                    # [S,3,3]
    xty = jnp.einsum("spi,spk->sik", x, src_pts)              # [S,3,2]
    sol = jnp.linalg.solve(xtx, xty)                          # [S,3,2]
    return jnp.swapaxes(sol, -1, -2)                          # [S,2,3]


def random_perspective_affine(key, s, h, w, distortion=0.33, p=0.2):
    """torchvision RandomPerspective corner displacements -> per-sample
    affine fit [S,2,3] (identity with prob 1-p)."""
    k_apply, k_pts = jax.random.split(key)
    half_h = distortion * h // 2
    half_w = distortion * w // 2
    d = jax.random.uniform(k_pts, (s, 4, 2))
    disp = jnp.stack([
        jnp.stack([d[:, 0, 0] * half_w, d[:, 0, 1] * half_h], -1),
        jnp.stack([-d[:, 1, 0] * half_w, d[:, 1, 1] * half_h], -1),
        jnp.stack([-d[:, 2, 0] * half_w, -d[:, 2, 1] * half_h], -1),
        jnp.stack([d[:, 3, 0] * half_w, -d[:, 3, 1] * half_h], -1),
    ], 1)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    corners = jnp.asarray([[-cx, -cy], [cx, -cy], [cx, cy], [-cx, cy]],
                          jnp.float32)[None]
    startpoints = jnp.broadcast_to(corners, (s, 4, 2))
    endpoints = startpoints + disp
    aff = _fit_affine(endpoints, startpoints)   # sample src=start at dst=end
    apply = (jax.random.uniform(k_apply, (s,)) < p)[:, None, None]
    eye = jnp.broadcast_to(jnp.concatenate(
        [jnp.eye(2), jnp.zeros((2, 1))], 1), aff.shape)
    return jnp.where(apply, aff, eye)


def _compose(a, b):
    """Affine composition: warp-by-a then warp-by-b == single warp with
    src = a2 @ (b2 @ dst + bt) + at  ... i.e. out(x)=in(A(B(x)))."""
    a2, at = a[:, :, :2], a[:, :, 2]
    b2, bt = b[:, :, :2], b[:, :, 2]
    c2 = jnp.einsum("sij,sjk->sik", a2, b2)
    ct = jnp.einsum("sij,sj->si", a2, bt) + at
    return jnp.concatenate([c2, ct[:, :, None]], -1)


def random_rotate_affine(key, s, angles=_ROT_ANGLES):
    idx = jax.random.randint(key, (s,), 0, len(angles))
    a2 = _rot_a2(jnp.asarray(angles)[idx])
    return jnp.concatenate([a2, jnp.zeros((s, 2, 1))], -1)


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


def _jitter_affine(key, s, d):
    """jitter(d): integer translate dx,dy in {0..d-1} (transforms.py:27-33);
    src = dst - t  ->  t_eff = -d."""
    dxy = jax.random.randint(key, (s, 2), 0, d).astype(jnp.float32)
    a2 = jnp.broadcast_to(jnp.eye(2), (s, 2, 2))
    return jnp.concatenate([a2, -dxy[:, :, None]], -1)


def transforms_fast(key, cuts):
    """perspective(0.33,p=0.2) ∘ rotate(±30°,20x0) as one separable affine,
    then erasing(p=0.2), then CLIP normalize (transforms.py:165-170)."""
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    aff = _compose(random_perspective_affine(k1, s, h, w),
                   random_rotate_affine(k2, s))
    cuts = affine_warp(cuts, aff, pad=56, compute_dtype=jnp.bfloat16)
    cuts = random_erasing(k3, cuts)
    return clip_normalize(cuts)


def transforms_custom(key, cuts):
    """pad(4, gray) + rotate + jitter(8) + normalize (transforms.py:156-163).
    Gray border emulated by slight scale-down with 0.5 fill."""
    s, c, h, w = cuts.shape
    k1, k2 = jax.random.split(key)
    pad_scale = (h + 8.0) / h      # inverse map scales up -> image shrinks
    scale_aff = jnp.broadcast_to(jnp.concatenate(
        [pad_scale * jnp.eye(2), jnp.zeros((2, 1))], 1), (s, 2, 3))
    aff = _compose(scale_aff, _compose(random_rotate_affine(k1, s),
                                       _jitter_affine(k2, s, 8)))
    cuts = affine_warp(cuts, aff, pad=56, fill=0.5, compute_dtype=jnp.bfloat16)
    return clip_normalize(cuts)


def transforms_elastic(key, cuts):
    """pad + erasing + rotate + elastic + jitter + normalize
    (transforms.py:147-154), with a real separable elastic displacement:
    smooth random per-row dx(y) and per-column dy(x) via FFT-phase shifts."""
    s, c, h, w = cuts.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    aff = _compose(random_rotate_affine(k1, s), _jitter_affine(k2, s, 8))
    cuts = affine_warp(cuts, aff, pad=56, fill=0.5, compute_dtype=jnp.bfloat16)
    cuts = random_erasing(k3, cuts)
    # separable elastic: coarse smooth 1D displacement tracks, amp ~ 6 px
    def smooth_track(k, n):
        coarse = jax.random.uniform(k, (s, 9), minval=-1.0, maxval=1.0)
        return jax.image.resize(coarse, (s, n), "cubic") * 6.0
    dx = smooth_track(k4, h)   # x-shift per row
    dy = smooth_track(k5, w)   # y-shift per column
    cuts = fractional_shift(cuts, dx[:, None, :], axis=-1)
    cuts = fractional_shift(cuts, dy[:, None, :], axis=-2)
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
