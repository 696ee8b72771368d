"""Shared color head: Lucent-style color decorrelation + sigmoid.

Behavioral parity with reference aphantasia/image.py:14-29 (`to_valid_rgb`,
`_linear_decorrelate_color`) and image.py:185-197 (`un_rgb`), re-designed as
pure functions over jnp arrays (no closures over device state).

The 3x3 matrix is the empirical sqrt of the ImageNet color correlation from
the Lucid/Lucent libraries; its first row is divided by the `colors`
(saturation) argument before normalization.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax

# sqrt of ImageNet color correlation (Lucid), reference image.py:15
_COLOR_CORRELATION_SVD_SQRT = np.asarray(
    [[0.26, 0.09, 0.02],
     [0.27, 0.00, -0.05],
     [0.27, -0.09, 0.03]], dtype=np.float64)

# CLIP input normalization (reference aphantasia/transforms.py:106)
CLIP_MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), dtype=np.float32)
CLIP_STD = np.asarray((0.26862954, 0.26130258, 0.27577711), dtype=np.float32)


def color_matrix(colors: float = 1.0) -> np.ndarray:
    """Normalized decorrelation matrix, transposed for `image @ M` contraction.

    Matches reference image.py:15-19: divide first row by `colors`
    (saturation), normalize by the max column norm, transpose.
    Returned as float32 numpy [3,3] — a compile-time constant.
    """
    m = _COLOR_CORRELATION_SVD_SQRT / np.asarray([colors, 1.0, 1.0])[:, None]
    max_norm = np.linalg.norm(m, axis=0).max()
    return (m / max_norm).T.astype(np.float32)


def decorrelate(image: jnp.ndarray, colcorr_t: jnp.ndarray) -> jnp.ndarray:
    """einsum('nchw,cd->ndhw') — reference image.py:21-22."""
    return jnp.einsum("nchw,cd->ndhw", image, colcorr_t)


def to_valid_rgb(image: jnp.ndarray, colors: float = 1.0,
                 decorrelate_colors: bool = True) -> jnp.ndarray:
    """Map a decoded parameterizer output to valid RGB in [0,1].

    Pure-function equivalent of the reference `to_valid_rgb` wrapper
    (image.py:14-29): optional linear color decorrelation then sigmoid.
    """
    if decorrelate_colors:
        image = decorrelate(image, jnp.asarray(color_matrix(colors)))
    return jax.nn.sigmoid(image)


def clip_normalize(image: jnp.ndarray) -> jnp.ndarray:
    """CLIP mean/std normalization over NCHW batch (transforms.py:102-109).

    Dtype-preserving: the constants follow the image dtype so a bf16
    augmentation pipeline stays bf16 into the tower (f32 constants would
    silently promote — and did: the r3 trace showed the patchify layout
    copies running f32 because this promotion sat between the bf16 warp
    and the tower's astype)."""
    mean = jnp.asarray(CLIP_MEAN, image.dtype)[None, :, None, None]
    std = jnp.asarray(CLIP_STD, image.dtype)[None, :, None, None]
    return (image - mean) / std


def un_rgb(image: jnp.ndarray, colors: float = 1.0) -> jnp.ndarray:
    """Inverse color transform used when resuming from an image.

    Parity with reference image.py:185-197: CLIP-normalize the [0,1] image
    then multiply by the inverse decorrelation matrix.  NOTE: the reference
    feeds the *normalized* image (not inverse-sigmoid) — kept as-is for
    checkpoint fidelity.

    Accepts [1,3,H,W] float in [0,1] or a HWC uint8-style numpy array.
    """
    if not isinstance(image, jnp.ndarray):
        image = jnp.asarray(np.asarray(image), dtype=jnp.float32)
    if image.ndim == 3:  # HWC [0..255]
        image = jnp.transpose(image, (2, 0, 1))[None] / 255.0
    inv = np.linalg.inv(color_matrix(colors)).astype(np.float32)
    image = clip_normalize(image)
    return jnp.einsum("nchw,cd->ndhw", image, jnp.asarray(inv))


def inv_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically-clamped logit (reference image.py:179-183)."""
    eps = 1e-12
    x = jnp.clip(x.astype(jnp.float64) if x.dtype == jnp.float64 else x, eps, 1 - eps)
    return jnp.log(x / (1 - x)).astype(jnp.float32)
