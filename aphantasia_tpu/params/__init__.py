"""Image parameterizers: pytrees + pure decode functions.

Each parameterizer provides
    init(...) -> params            (a pytree of jnp arrays, the ONLY trainable state)
    decode(params, ...) -> image   (pure function, [1,3,H,W] pre-color-head)
and the shared color head in `color.py` maps the decoded tensor to valid RGB.

Reference: aphantasia/image.py (FFT/DWT/pixel), cppn.py (CPPN),
CLIP_VQGAN.ipynb (VQGAN latents).
"""

from aphantasia_tpu.params.color import to_valid_rgb, un_rgb, color_matrix
from aphantasia_tpu.params.fft import (
    rfft2d_freqs, fft_scale, fft_init, fft_decode, img2fft, resume_fft, FFTParameterizer,
)
from aphantasia_tpu.params.pixel import pixel_init, pixel_decode, PixelParameterizer
