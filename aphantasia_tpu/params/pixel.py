"""Raw RGB pixel parameterizer (reference aphantasia/image.py:98-119).

Trainable state is the raw [1,3,H,W] tensor; decode rescales contrast by the
global std, or by the fixed empirical 3.3 divisor when resuming from an image
(`fixcontrast`, image.py:114-118).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.color import to_valid_rgb, un_rgb


def pixel_init(key: jax.Array, shape, sd: float = 1.0) -> jnp.ndarray:
    return sd * jax.random.normal(key, tuple(shape), dtype=jnp.float32)


def pixel_decode(params: jnp.ndarray, shift=None, contrast: float = 1.0,
                 fixcontrast: bool = False) -> jnp.ndarray:
    """image.py:114-118; `shift` accepted for API uniformity (ignored)."""
    del shift
    if fixcontrast:
        return params * contrast / 3.3
    return params * contrast / jnp.std(params, ddof=1)


def resume_pixel(resume=None, shape=None, sd: float = 1.0,
                 key: jax.Array | None = None):
    """None -> sd*randn; image path -> 3.3*un_rgb(img) (image.py:98-112)."""
    size = None
    if resume is None:
        assert key is not None
        params = pixel_init(key, shape, sd)
    elif isinstance(resume, str):
        if not os.path.isfile(resume):
            raise FileNotFoundError(f"Image not found: {resume}")
        from aphantasia_tpu.io.media import img_read
        img_in = img_read(resume)
        params = 3.3 * un_rgb(img_in, colors=2.0)
        size = img_in.shape[:2]
    else:
        if isinstance(resume, list):
            resume = resume[0]
        params = jnp.asarray(resume)
    return params, size


@dataclasses.dataclass(frozen=True)
class PixelParameterizer:
    size: tuple
    colors: float = 1.8
    fixcontrast: bool = False

    def init(self, key: jax.Array, sd: float = 1.0) -> jnp.ndarray:
        h, w = self.size
        return pixel_init(key, (1, 3, h, w), sd)

    def decode(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        return pixel_decode(params, shift, contrast, self.fixcontrast)

    def image(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        return to_valid_rgb(self.decode(params, shift, contrast), colors=self.colors)
