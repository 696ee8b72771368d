"""Direct unit tests for ops/losses.py — the similarity menu and
sharpness measures (reference aphantasia/utils.py:256-295 semantics).
Previously exercised only inside the jitted step."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.losses import (cossim, dot_compare, sim_func,
                                       derivat, aesthetic_init,
                                       aesthetic_apply, aesthetic_dims)


@pytest.fixture
def vecs():
    rng = np.random.RandomState(0)
    v1 = jnp.asarray(rng.randn(1, 64).astype(np.float32))
    v2 = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    return v1, v2


def test_cossim_matches_numpy(vecs):
    v1, v2 = vecs
    got = np.asarray(cossim(v1, v2))
    a, b = np.asarray(v1), np.asarray(v2)
    want = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                              * np.linalg.norm(b, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # identical vectors -> 1; opposite -> -1
    assert float(cossim(v1, v1)[0]) == pytest.approx(1.0, abs=1e-6)
    assert float(cossim(v1, -v1)[0]) == pytest.approx(-1.0, abs=1e-6)


def test_sim_func_menu_identities(vecs):
    v1, v2 = vecs
    # default == cossim mean
    assert float(sim_func(v1, v2)) == pytest.approx(
        float(np.asarray(cossim(v1, v2)).mean()), rel=1e-6)
    # spherical distance of a vector to itself is 0; mix == cossim there
    assert float(np.asarray(sim_func(v1, v1, "spherical")).max()) < 1e-5
    assert float(sim_func(v1, v1, "mix")) == pytest.approx(1.0, abs=1e-4)
    # angular of identical vectors = 1 (acos(1)=0)
    assert float(sim_func(v1, v1, "angular")) == pytest.approx(1.0, abs=1e-5)
    # mix = cossim - 0.25*spherical (utils.py:295)
    mix = float(sim_func(v1, v2, "mix"))
    cs = float(np.asarray(cossim(v1, v2)).mean())
    sp = float(np.asarray(sim_func(v1, v2, "spherical")).mean())
    assert mix == pytest.approx(cs - 0.25 * sp, rel=1e-5)
    # dot variant is dot * cossim (cossim_pow=1, clip_fft loss shape)
    d = float(sim_func(v1, v1, "dot"))
    assert d == pytest.approx(float(dot_compare(v1, v1, 1)), rel=1e-6)


def test_derivat_modes():
    # a horizontal ramp: |dx| = slope everywhere, |dy| = 0
    w = 16
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, w), (1, 3, 12, w))
    naiv = float(derivat(ramp, "naiv"))
    assert naiv == pytest.approx(0.5 * (1.0 / (w - 1)), rel=1e-4)
    # constant image: zero sharpness in every mode
    flat = jnp.full((1, 3, 12, 16), 0.3)
    for mode in ("naiv", "scharr", "sobel"):
        assert float(derivat(flat, mode)) == pytest.approx(0.0, abs=1e-6)
    # sobel/scharr positive on the ramp
    assert float(derivat(ramp, "sobel")) > 0
    assert float(derivat(ramp, "scharr")) > 0


def test_aesthetic_head_shapes():
    for model, d in (("ViT-B/32", 512), ("ViT-L/14", 768)):
        assert aesthetic_dims(model) == d
        p = aesthetic_init(jax.random.PRNGKey(0), model)
        out = aesthetic_apply(p, jnp.ones((4, d)))
        assert out.shape == (4, 1) or out.shape == (4,)
