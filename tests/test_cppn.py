"""CPPN generator + shader export tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.params.cppn import (
    CPPNParameterizer, export_npy, load_npy, to_shader_layers, get_mgrid)
from aphantasia_tpu.shader_expo import cppn_to_shader, export_all


def test_decode_shape_and_range():
    par = CPPNParameterizer((32, 48), nf=8, num_layers=3, act_fn="unbias")
    params = par.init(jax.random.PRNGKey(0))
    img = par.image(params)
    assert img.shape == (1, 3, 32, 48)
    assert 0 <= float(img.min()) and float(img.max()) <= 1


@pytest.mark.parametrize("act", ["unbias", "comp", "relu"])
def test_activations(act):
    par = CPPNParameterizer((16, 16), nf=8, num_layers=2, act_fn=act)
    params = par.init(jax.random.PRNGKey(1))
    # channel doubling: hidden input dim is 2*nf unless relu
    expect_in = 8 if act == "relu" else 16
    assert params[1]["w"].shape == (expect_in, 8)
    assert np.isfinite(np.asarray(par.image(params))).all()


def test_npy_roundtrip_matches_reference_layout(tmp_path):
    par = CPPNParameterizer((16, 16), nf=8, num_layers=3, act_fn="unbias")
    params = par.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "snap.npy")
    export_npy(params, path)
    arrays = np.load(path, allow_pickle=True)
    assert arrays[0].shape == (1, 1, 2, 8)    # [1,1,in,out] like the reference
    loaded, nf, layers, act = load_npy(path)
    assert (nf, layers, act) == (8, 3, "unbias")
    a = np.asarray(par.image(params))
    b = np.asarray(par.image(loaded))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_mgrid_matches_reference():
    g = get_mgrid(4, 3)  # (sideX, sideY)
    assert g.shape == (1, 2, 4, 3)
    # channel 0 = sideY linspace varying along the last axis (cppn.py:135-139)
    np.testing.assert_allclose(g[0, 0, 0], np.linspace(-1, 1, 3))
    np.testing.assert_allclose(g[0, 1, :, 0], np.linspace(-1, 1, 4))


def test_shader_export_all_targets(tmp_path):
    par = CPPNParameterizer((16, 16), nf=8, num_layers=3, act_fn="unbias")
    params = par.init(jax.random.PRNGKey(3))
    layers = to_shader_layers(params, "unbias")
    glsl = cppn_to_shader(layers, mode="shadertoy", size=(16, 16))
    assert "mainImage" in glsl and "atan" in glsl and "N_HIDDEN 8" in glsl
    hlsl = cppn_to_shader(layers, mode="vvvv", size=(16, 16))
    assert "SV_Target" in hlsl and "float4x4" in hlsl
    buf = cppn_to_shader(layers, mode="buffer", size=(16, 16))
    assert "," in buf and "float" not in buf  # pure value dump
    paths = export_all(layers, str(tmp_path / "s"), (16, 16))
    assert all(os.path.isfile(p) for p in paths)
    exts = {os.path.splitext(p)[1] for p in paths}
    assert exts == {".glsl", ".tfx", ".txt"}


@pytest.mark.slow
def test_cppn_cli_tiny(tmp_path):
    from aphantasia_tpu.cli.cppn import main
    out = str(tmp_path / "o")
    main(["-t", "test", "--size", "32-32", "--steps", "2", "--samples", "2",
          "-l", "2", "-nf", "8", "--out_dir", out, "--fstep", "1"])
    sub = os.path.join(out, "cppn")
    files = os.listdir(sub)
    assert any(f.endswith(".npy") for f in files)
    assert any(f.endswith(".glsl") for f in files)


@pytest.mark.slow
def test_cppn_cli_export_roundtrip(tmp_path):
    from aphantasia_tpu.cli.cppn import main
    out = str(tmp_path / "o")
    main(["-t", "t", "--size", "24-24", "--steps", "1", "--samples", "2",
          "-l", "2", "-nf", "8", "--out_dir", out, "--fstep", "1"])
    sub = os.path.join(out, "cppn")
    run_dir = [os.path.join(sub, d) for d in os.listdir(sub)
               if os.path.isdir(os.path.join(sub, d))]
    npys = [f for f in os.listdir(sub) if f.endswith(".npy")]
    npy = os.path.join(sub, npys[0])
    main(["-r", npy, "--export", "--size", "24-24", "--out_dir", out])
    assert os.path.isfile(npy.replace(".npy", ".jpg"))


@pytest.mark.slow
def test_cppn_cli_dualmod_tiny(tmp_path):
    """dualmod through cppn's chunked loop (both towers in-graph)."""
    import os
    from aphantasia_tpu.cli.cppn import main
    out = str(tmp_path / "outdm")
    main(["-t", "test", "--size", "48-48", "--steps", "4", "--fstep", "2",
          "--samples", "3", "--nf", "8", "--layers", "2", "--out_dir", out,
          "--dualmod", "2"])
    work = os.path.join(out, "cppn")
    run = [os.path.join(work, d) for d in os.listdir(work)
           if os.path.isdir(os.path.join(work, d))][0]
    assert len([f for f in os.listdir(run) if f.endswith(".jpg")]) == 2
    assert len([f for f in os.listdir(run) if f.endswith(".npy")]) == 2
