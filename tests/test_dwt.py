"""DWT: filter-bank correctness, perfect reconstruction, parameterizer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.params.wavelets import (
    daubechies, wavelet_filters, dwt_max_level)
from aphantasia_tpu.params.dwt import (
    wavedec2, waverec2, DWTParameterizer, img2dwt, dwt_scale)


pytestmark = pytest.mark.slow  # compile-heavy wavelet suite

def test_db2_known_coefficients():
    # published db2 scaling filter (pywt rec_lo)
    want = np.array([0.48296291314469025, 0.836516303737469,
                     0.22414386804185735, -0.12940952255092145])
    np.testing.assert_allclose(daubechies(2), want, atol=1e-12)


def test_db4_known_first_coefficient():
    h = daubechies(4)
    np.testing.assert_allclose(h[0], 0.23037781330885523, atol=1e-10)


@pytest.mark.parametrize("wave", ["haar", "db2", "db4", "db8", "sym4",
                                  "coif1", "coif2", "coif5"])
def test_orthonormality(wave):
    _, _, rl, _ = wavelet_filters(wave)
    assert abs(np.dot(rl, rl) - 1) < 1e-8
    for k in range(1, len(rl) // 2):
        assert abs(np.dot(rl[:len(rl) - 2 * k], rl[2 * k:])) < 1e-7


@pytest.mark.parametrize("wave", ["haar", "db2", "db3", "coif2", "dmey"])
@pytest.mark.parametrize("hw", [(32, 32), (33, 47), (64, 48)])
def test_perfect_reconstruction(wave, hw):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 3, *hw).astype(np.float32))
    level = 3
    yl, yhs = wavedec2(x, wave, level)
    rec = waverec2(yl, yhs, wave, hw)
    tol = 5e-3 if wave == "dmey" else 1e-4  # dmey is inherently truncated
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=tol)


def test_subband_shapes_pywt_lengths():
    x = jnp.zeros((1, 3, 40, 40))
    yl, yhs = wavedec2(x, "db2", 2)
    # (n + L - 1)//2: (40+3)//2=21, (21+3)//2=12
    assert yhs[0].shape == (1, 3, 3, 21, 21)
    assert yhs[1].shape == (1, 3, 3, 12, 12)
    assert yl.shape == (1, 3, 12, 12)


def test_max_level_matches_reference_formula():
    # reference computes maxlevel with db1 (image.py:35): floor(log2(n))
    assert dwt_max_level(720) == 9
    assert dwt_max_level(512) == 9
    assert dwt_max_level(256) == 8


def test_parameterizer_decode():
    par = DWTParameterizer((32, 48), wave="db2", sharp=0.3, colors=1.6)
    params = par.init(jax.random.PRNGKey(0))
    assert len(params) == par.level + 1
    img = par.image(params)
    assert img.shape == (1, 3, 32, 48)
    assert float(img.min()) >= 0 and float(img.max()) <= 1


def test_dwt_scale_formula():
    par = DWTParameterizer((64, 64), wave="db2", sharp=0.3)
    params = par.init(jax.random.PRNGKey(1))
    scale = dwt_scale(params, 0.3)
    h0, w0 = params[1].shape[3:5]
    for i, s in enumerate(scale):
        h, w = params[i + 1].shape[3:5]
        np.testing.assert_allclose(s, ((h0 * w0) / (h * w)) ** 0.7)


def test_img2dwt_roundtrip_correlates():
    rs = np.random.RandomState(3)
    img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
    params = img2dwt(img, wave="db2", sharp=0.3, colors=1.6)
    par = DWTParameterizer((32, 32), wave="db2", sharp=0.3, colors=1.6)
    out = par.image([jnp.asarray(np.asarray(p)) for p in params])
    src = jnp.transpose(jnp.asarray(img / 255.0, jnp.float32), (2, 0, 1))[None]
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(src).ravel())[0, 1]
    assert corr > 0.85


def test_gradient_flows():
    par = DWTParameterizer((32, 32), wave="coif2")
    params = par.init(jax.random.PRNGKey(2))

    def loss(ps):
        return jnp.sum(par.image(ps) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
