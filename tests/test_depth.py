"""Depth-Anything-V2 + depth warp tests (random weights; shape/finiteness +
HF-golden parity when transformers provides the architecture)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.models.depth_anything import (
    DAV2_CONFIGS, dav2_init, dav2_apply, InferDepthAny)
from aphantasia_tpu.motion.depthwarp import (
    triangle_blur, grid_warp, depthwarp, depth_transform)


pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)

def test_dav2_shapes():
    cfg = DAV2_CONFIGS["s"]
    params = dav2_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 3, 56, 70))  # multiples of 14
    out = dav2_apply(params, cfg, x)
    assert out.shape == (1, 1, 56, 70)
    assert np.isfinite(np.asarray(out)).all()


def test_infer_depth_any_normalized():
    inf = InferDepthAny("s", key=jax.random.PRNGKey(1))
    img = jnp.asarray(np.random.RandomState(0).rand(1, 3, 56, 56), jnp.float32)
    d = inf(img)
    assert d.shape == (1, 1, 56, 56)
    assert abs(float(d.min())) < 1e-5 and abs(float(d.max()) - 1) < 1e-5


def test_triangle_blur_preserves_mean():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(1, 3, 16, 16), jnp.float32)
    y = triangle_blur(x, 5, 2.0)
    assert y.shape == x.shape
    assert abs(float(y.mean()) - float(x.mean())) < 0.01


def test_grid_warp_identity_when_zero_strength():
    rs = np.random.RandomState(3)
    img = jnp.asarray(rs.rand(1, 3, 20, 20), jnp.float32)
    depth = jnp.asarray(rs.rand(1, 20, 20), jnp.float32)
    out = grid_warp(img, depth, 0.0, jnp.zeros(2), 0.5, dlens=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_depthwarp_runs():
    inf = InferDepthAny("s", key=jax.random.PRNGKey(4))
    rs = np.random.RandomState(5)
    img_t = jnp.asarray(rs.randn(1, 3, 28, 42), jnp.float32)
    img = jnp.asarray(rs.rand(1, 3, 28, 42), jnp.float32)
    out = depthwarp(img_t, img, inf, strength=0.1, centre=(0.1, 0.0),
                    midpoint=0.5)
    assert out.shape == img_t.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_hf_parity_tiny():
    """Golden vs transformers DepthAnythingForDepthEstimation (tiny config)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from transformers import DepthAnythingConfig, DepthAnythingForDepthEstimation
    from aphantasia_tpu.models.depth_anything.convert import convert_hf_dav2
    from aphantasia_tpu.models.depth_anything.dpt import DAV2Config

    bb = dict(hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
              intermediate_size=64, image_size=28, patch_size=14,
              out_indices=[1, 2, 3, 4], apply_layernorm=True,
              reshape_hidden_states=False)
    cfg_hf = DepthAnythingConfig(
        backbone_config={"model_type": "dinov2", **bb},
        fusion_hidden_size=16, patch_size=14, reassemble_hidden_size=32,
        neck_hidden_sizes=[8, 12, 16, 20], head_hidden_size=8,
        reassemble_factors=[4, 2, 1, 0.5])
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg_hf).eval()
    params = convert_hf_dav2(model)
    cfg = DAV2Config("t", 32, 4, 2, (0, 1, 2, 3), (8, 12, 16, 20), 16)
    x = np.random.RandomState(0).randn(1, 3, 28, 42).astype(np.float32)
    with torch.no_grad():
        want = model(pixel_values=torch.from_numpy(x)).predicted_depth.numpy()
    got = np.asarray(dav2_apply(params, cfg, jnp.asarray(x)))[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_dpt_down_conv_padding_matches_torch():
    """The neck's stride-2 reassemble down conv must use torch's (1,1)
    padding, not XLA SAME's (0,1) — on even grids the two differ by a
    one-pixel window shift.  Tested in isolation because the tiny HF
    golden's fusion weights make level 3 numerically inert (zeroing its
    weights changes the output by ~1e-10 in BOTH frameworks), so the
    end-to-end golden cannot see this layer."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from aphantasia_tpu.models.depth_anything.dpt import _conv

    rs = np.random.RandomState(0)
    x = rs.randn(1, 5, 4, 6).astype(np.float32)    # NCHW, even grid
    w = rs.randn(5, 5, 3, 3).astype(np.float32)    # OIHW
    with torch.no_grad():
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                        stride=2, padding=1).numpy()
    got = np.asarray(_conv(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(w.transpose(2, 3, 1, 0)),
                           stride=2, padding=((1, 1), (1, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)
