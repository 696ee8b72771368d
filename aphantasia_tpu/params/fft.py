"""FFT spectrum parameterizer.

The trainable state is a real/imag rfft2 spectrum `[1,3,H,W//2+1,2]`; decoding
scales it by a 1/f^decay frequency curve and inverse-rFFTs to an image whose
global contrast is normalized by its std.

Behavioral parity with reference aphantasia/image.py:122-220 (`rfft2d_freqs`,
`resume_fft`, `fft_image`, `un_spectrum`, `img2fft`), re-architected as pure
jittable functions: the decay-scale array is a compile-time constant, decode is
`decode(params, shift, contrast)` with no hidden closure state, and spectrum
`shift` input supports interpolation / noise injection (image.py:166-167).
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.color import to_valid_rgb, un_rgb


@functools.lru_cache(maxsize=8)
def _irfft2_mats(h: int, w: int):
    """Dense ortho-irfft2 factor matrices (cached numpy).

    XLA's TPU FFT lowering runs far off the roofline at these shapes (the
    720p decode measured ~2ms vs ~0.15ms as matmuls), so the decode runs
    the separable inverse as MXU matmuls:
      ifft_H:  R' = C_h R - S_h I ; I' = S_h R + C_h I      (ortho 1/sqrt h)
      irfft_W: img = R' @ CW + I' @ SW                       (ortho, weights
               2 for interior bins folded into CW/SW)
    """
    wf = w // 2 + 1
    j = np.arange(h)[:, None]
    k = np.arange(h)[None, :]
    ang_h = 2.0 * np.pi * j * k / h
    c_h = (np.cos(ang_h) / np.sqrt(h)).astype(np.float32)     # [h,h]
    s_h = (np.sin(ang_h) / np.sqrt(h)).astype(np.float32)
    kw = np.arange(wf)[:, None]
    x = np.arange(w)[None, :]
    ang_w = 2.0 * np.pi * kw * x / w
    wk = np.full((wf, 1), 2.0)
    wk[0] = 1.0
    if w % 2 == 0:
        wk[-1] = 1.0
    cw = (wk * np.cos(ang_w) / np.sqrt(w)).astype(np.float32)  # [wf,w]
    sw = (-wk * np.sin(ang_w) / np.sqrt(w)).astype(np.float32)
    return c_h, s_h, cw, sw


@functools.lru_cache(maxsize=8)
def _irfft2_mats_jnp(h: int, w: int):
    """The factor matrices as SHARED jnp constants: every trace site closes
    over the same array objects, so a program that decodes in several places
    (loss + render + VJP) embeds each matrix once.  Per-call `jnp.asarray`
    created fresh objects and the serialized module repeated the ~2-3MB
    matrices per use — large fused programs then exceeded the tunneled
    compile service's request-size limit (HTTP 413)."""
    with jax.ensure_compile_time_eval():   # concrete even mid-trace
        return tuple(jnp.asarray(m) for m in _irfft2_mats(h, w))


def irfft2_ortho(re: jnp.ndarray, im: jnp.ndarray, size,
                 compute_dtype=None) -> jnp.ndarray:
    """[..., h, wf] real/imag rfft2 spectrum -> [..., h, w] image, matching
    jnp.fft.irfft2(norm='ortho') to `compute_dtype` matmul precision.

    compute_dtype=bf16 runs the six DFT matmuls at double MXU pump with
    f32 accumulation (bf16 shares f32's exponent range, so the 1/f^decay
    dynamic range survives; per-element rounding is ~0.4% relative — far
    below the optimization noise floor).  Output stays f32."""
    h, w = size
    c_h, s_h, cw, sw = _irfft2_mats_jnp(h, w)
    if compute_dtype is not None and compute_dtype != jnp.float32:
        dt = compute_dtype
        c_h, s_h = c_h.astype(dt), s_h.astype(dt)
        cw, sw = cw.astype(dt), sw.astype(dt)
        re, im = re.astype(dt), im.astype(dt)
        kw = dict(preferred_element_type=jnp.float32)
    else:
        kw = {}
    r2 = jnp.einsum("jk,...kw->...jw", c_h, re, **kw) - jnp.einsum(
        "jk,...kw->...jw", s_h, im, **kw)
    i2 = jnp.einsum("jk,...kw->...jw", s_h, re, **kw) + jnp.einsum(
        "jk,...kw->...jw", c_h, im, **kw)
    if kw:
        r2, i2 = r2.astype(compute_dtype), i2.astype(compute_dtype)
    return jnp.einsum("...jk,kw->...jw", r2, cw, **kw) + jnp.einsum(
        "...jk,kw->...jw", i2, sw, **kw)


def spectrum_to_image(params: jnp.ndarray, size) -> jnp.ndarray:
    """Raw [...,h,wf,2] real/imag spectrum -> [...,h,w] image via ortho
    irfft2 — the video modes' motion round-trip half (illustrip.py:393-409);
    NO decay scaling (that belongs to fft_decode)."""
    spec = jax.lax.complex(params[..., 0], params[..., 1])
    return jnp.fft.irfft2(spec, s=tuple(size), norm="ortho")


def image_to_spectrum(img: jnp.ndarray, size) -> jnp.ndarray:
    """Inverse of spectrum_to_image: image -> raw real/imag spectrum."""
    spec = jnp.fft.rfft2(img, s=tuple(size), norm="ortho")
    return jnp.stack([spec.real, spec.imag], axis=-1)


def rfft2d_freqs(h: int, w: int) -> np.ndarray:
    """2D rfft spectrum frequency magnitudes (reference image.py:122-128)."""
    fy = np.fft.fftfreq(h)[:, None]
    w2 = (w + 1) // 2 if w % 2 == 1 else w // 2 + 1
    fx = np.fft.fftfreq(w)[:w2]
    return np.sqrt(fx * fx + fy * fy)


def fft_scale(h: int, w: int, decay_power: float = 1.0) -> np.ndarray:
    """Frequency-decay scale curve `[1,1,h,w//2+1,1]` (image.py:159-162).

    1 / max(freq, 4/max(h,w))^decay, multiplied by sqrt(h*w).
    """
    freqs = rfft2d_freqs(h, w)
    scale = 1.0 / np.maximum(freqs, 4.0 / max(h, w)) ** decay_power
    scale *= np.sqrt(h * w)
    return scale.astype(np.float32)[None, None, :, :, None]


@functools.lru_cache(maxsize=8)
def _scale_jnp(h: int, w: int, decay_power: float) -> jnp.ndarray:
    """Decay curve as a shared jnp constant (see _irfft2_mats_jnp)."""
    with jax.ensure_compile_time_eval():
        return jnp.asarray(fft_scale(h, w, decay_power))


def fft_init(key: jax.Array, shape, sd: float = 0.01) -> jnp.ndarray:
    """Random spectrum init `sd * randn([1,3,h,w//2+1,2])`.

    The reference hardcodes sd=0.01 for random init (image.py:134) regardless
    of the `sd` argument; we default to the same but keep it overridable.
    """
    n, c, h, w = shape
    params_shape = (n, c, h, w // 2 + 1, 2)
    return sd * jax.random.normal(key, params_shape, dtype=jnp.float32)


def fft_decode(params: jnp.ndarray, scale: jnp.ndarray, size,
               shift: jnp.ndarray | None = None,
               contrast: float = 1.0, compute_dtype=None) -> jnp.ndarray:
    """spectrum -> image, pure and jittable (reference image.py:164-175).

    scaled = scale * (params [+ shift]); image = irfft2(scaled, norm='ortho');
    image *= contrast / std(image).  `std` uses Bessel's correction to match
    torch.Tensor.std().  `compute_dtype`: see irfft2_ortho.
    """
    h, w = size
    scaled = scale * params
    if shift is not None:
        scaled = scaled + scale * shift
    image = irfft2_ortho(scaled[..., 0], scaled[..., 1], (h, w),
                         compute_dtype=compute_dtype)
    std = jnp.std(image, ddof=1)
    return image * contrast / std


def un_spectrum(spectrum: jnp.ndarray, decay_power: float) -> jnp.ndarray:
    """Undo the decay scaling (reference image.py:199-206).

    NOTE the reference uses floor frequency 1/max(w,h) here (vs 4/max in the
    forward scale) — kept for parity.
    """
    h = spectrum.shape[2]
    w = (spectrum.shape[3] - 1) * 2
    freqs = rfft2d_freqs(h, w)
    scale = 1.0 / np.maximum(freqs, 1.0 / max(w, h)) ** decay_power
    scale *= np.sqrt(w * h)
    return spectrum / jnp.asarray(scale.astype(np.float32)[None, None, :, :, None])


def img2fft(img_in, decay: float = 1.0, colors: float = 1.0) -> jnp.ndarray:
    """Image -> spectrum params for resume-from-image (image.py:208-220).

    un_rgb -> rfft2(norm='ortho') -> un-scale by decay curve -> *500000
    (empirical gain, image.py:219 "[sic!!!]").
    """
    image_t = un_rgb(img_in, colors=colors)
    h, w = image_t.shape[2], image_t.shape[3]
    spec = jnp.fft.rfft2(image_t, s=(h, w), norm="ortho")
    spectrum = jnp.stack([spec.real, spec.imag], axis=-1)
    spectrum = un_spectrum(spectrum, decay_power=decay)
    return spectrum * 500000.0


def resume_fft(resume=None, shape=None, decay: float | None = None,
               colors: float = 1.6, sd: float = 0.01, key: jax.Array | None = None):
    """Resolve FFT params from None / .pt path / image path / array.

    Parity with reference image.py:130-150:
      None        -> 0.01*randn (key required)
      .pt path    -> loaded params * sd
      image path  -> img2fft(image); returns inferred size
      array/list  -> as-is
    Returns (params, size_or_None).
    """
    size = None
    if resume is None:
        assert key is not None, "random init needs a PRNG key"
        params = fft_init(key, shape, sd=0.01)
    elif isinstance(resume, str):
        if not os.path.isfile(resume):
            raise FileNotFoundError(f"Snapshot not found: {resume}")
        ext = os.path.splitext(resume)[1].lower()[1:]
        if ext in ("jpg", "jpeg", "png", "tif", "bmp"):
            from aphantasia_tpu.io.media import img_read
            img_in = img_read(resume)
            params = img2fft(img_in, decay, colors)
            size = img_in.shape[:2]
        else:
            from aphantasia_tpu.io.checkpoint import load_pt
            params = load_pt(resume)
            if isinstance(params, list):
                params = params[0]
            params = jnp.asarray(np.asarray(params)) * sd
    else:
        if isinstance(resume, list):
            resume = resume[0]
        params = jnp.asarray(resume)
    return params, size


@dataclasses.dataclass(frozen=True)
class FFTParameterizer:
    """Static decode config bundling size + decay curve + color head.

    Replaces the reference's `fft_image` closure factory (image.py:152-177)
    with an explicit (config, params) split so `decode` can live inside jit.
    """
    size: tuple          # (H, W)
    decay_power: float = 1.0
    colors: float = 1.6
    # DFT matmul precision: "auto" = bf16 on TPU (f32 accumulation — see
    # irfft2_ortho), f32 elsewhere, following the FUSED_ATTN backend-gate
    # pattern (models/clip/model.py).  Pass jnp.float32 to force f32
    # everywhere, or set APHANTASIA_DECODE_F32=1.
    compute_dtype: object = "auto"

    def init(self, key: jax.Array, sd: float = 0.01) -> jnp.ndarray:
        h, w = self.size
        return fft_init(key, (1, 3, h, w), sd=sd)

    @property
    def scale(self) -> np.ndarray:
        h, w = self.size
        return fft_scale(h, w, self.decay_power)

    def decode(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        dt = self.compute_dtype
        if dt == "auto":
            import os
            on_tpu = jax.default_backend() in ("tpu", "axon")
            dt = (jnp.bfloat16 if on_tpu
                  and os.environ.get("APHANTASIA_DECODE_F32") != "1"
                  else None)
        return fft_decode(params, _scale_jnp(*self.size, self.decay_power),
                          self.size, shift, contrast, compute_dtype=dt)

    def image(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        """Decode straight to valid RGB in [0,1]."""
        return to_valid_rgb(self.decode(params, shift, contrast), colors=self.colors)
