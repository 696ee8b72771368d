"""SIREN generator tests (capability listed at reference README.md:140-143;
architecture per Sitzmann et al. 2020 — see params/siren.py)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.params.siren import (
    SIRENParameterizer, export_npy, load_npy, to_shader_layers)
from aphantasia_tpu.shader_expo import cppn_to_shader, export_all


def test_decode_shape_and_range():
    par = SIRENParameterizer((32, 48), nf=16, num_layers=3)
    params = par.init(jax.random.PRNGKey(0))
    img = par.image(params)
    assert img.shape == (1, 3, 32, 48)
    assert 0 <= float(img.min()) and float(img.max()) <= 1


def test_init_bounds_follow_paper():
    par = SIRENParameterizer((8, 8), nf=64, num_layers=4, w0=30.0)
    params = par.init(jax.random.PRNGKey(1))
    # first layer: U(-1/in, 1/in) with in=2
    w0_abs = np.abs(np.asarray(params[0]["w"]))
    assert w0_abs.max() <= 0.5 + 1e-6
    # hidden: U(+-sqrt(6/in)/w0)
    bound = np.sqrt(6.0 / 64) / 30.0
    for p in params[1:-1]:
        assert np.abs(np.asarray(p["w"])).max() <= bound + 1e-6
    # activations stay ~unit-scale through depth (the point of the init)
    h, w = par.size
    x = np.asarray(par.decode(params))
    assert np.isfinite(x).all()


def test_decode_matches_manual_numpy():
    par = SIRENParameterizer((4, 6), nf=8, num_layers=2, w0=10.0, w0_first=20.0)
    params = par.init(jax.random.PRNGKey(2))
    from aphantasia_tpu.params.cppn import get_mgrid
    x = get_mgrid(6, 4)[0].reshape(2, -1).T
    x = np.sin(20.0 * (x @ np.asarray(params[0]["w"]) + np.asarray(params[0]["b"])))
    x = np.sin(10.0 * (x @ np.asarray(params[1]["w"]) + np.asarray(params[1]["b"])))
    x = x @ np.asarray(params[2]["w"]) + np.asarray(params[2]["b"])
    x = 1.0 / (1.0 + np.exp(-x))
    ref = x.T.reshape(1, 3, 4, 6)
    np.testing.assert_allclose(np.asarray(par.image(params)), ref,
                               rtol=1e-5, atol=1e-6)


def test_npy_roundtrip_shared_layout(tmp_path):
    par = SIRENParameterizer((16, 16), nf=8, num_layers=3)
    params = par.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "snap.npy")
    export_npy(params, path)
    arrays = np.load(path, allow_pickle=True)
    assert arrays[0].shape == (1, 1, 2, 8)    # CPPN-compatible layout
    loaded, nf, layers = load_npy(path)
    assert (nf, layers) == (8, 3)
    np.testing.assert_allclose(np.asarray(par.image(params)),
                               np.asarray(par.image(loaded)), atol=1e-6)


def test_shader_export_sine(tmp_path):
    par = SIRENParameterizer((16, 16), nf=8, num_layers=3, w0=10.0)
    params = par.init(jax.random.PRNGKey(4))
    layers = to_shader_layers(params, w0=10.0, w0_first=30.0)
    glsl = cppn_to_shader(layers, mode="shadertoy", size=(16, 16))
    assert "sin(bufA[0])" in glsl and "atan" not in glsl
    # w0 folded into exported weights: hidden bias scaled by w0
    np.testing.assert_allclose(layers[1]["bias"],
                               10.0 * np.asarray(params[1]["b"]), rtol=1e-6)
    paths = export_all(layers, str(tmp_path / "s"), (16, 16))
    assert all(os.path.isfile(p) for p in paths)


def test_gradient_step_reduces_pixel_loss():
    # SIREN must be trainable end-to-end: fit a flat gray target a few steps
    par = SIRENParameterizer((16, 16), nf=16, num_layers=3)
    params = par.init(jax.random.PRNGKey(5))
    target = jnp.full((1, 3, 16, 16), 0.25)

    def loss_fn(p):
        return jnp.mean((par.decode(p) - target) ** 2)

    import optax
    opt = optax.adam(1e-3)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    step = jax.jit(lambda p, s: _step(p, s))

    def _step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s

    for _ in range(20):
        params, state = step(params, state)
    assert float(loss_fn(params)) < l0


@pytest.mark.slow
def test_siren_cli_tiny(tmp_path):
    from aphantasia_tpu.cli.cppn import main
    out = str(tmp_path / "o")
    main(["-t", "test", "--size", "32-32", "--steps", "2", "--samples", "2",
          "-gen", "siren", "-l", "2", "-nf", "8", "--out_dir", out,
          "--fstep", "1"])
    sub = os.path.join(out, "cppn")
    names = os.listdir(sub)
    assert any("-siren" in f and f.endswith(".npy") for f in names)
    assert any(f.endswith(".glsl") for f in names)
    # resume path: architecture inferred from the snapshot
    snap = [os.path.join(sub, f) for f in names
            if "-siren" in f and f.endswith(".npy")][0]
    main(["-t", "test", "--size", "32-32", "--steps", "1", "--samples", "2",
          "-gen", "siren", "--out_dir", str(tmp_path / "o2"), "-r", snap])
