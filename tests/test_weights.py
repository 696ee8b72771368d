"""Opt-in real-checkpoint fidelity (VERDICT r1 item 3; BASELINE target:
CLIP-embedding cosine >= 0.98 vs the torch reference).

Run with real checkpoints present:

    APHANTASIA_CLIP_PT=/path/ViT-B-32.pt \
    APHANTASIA_DAV2_PT=/path/dav2-small  \
    APHANTASIA_VQGAN_PT=/path/last.ckpt  \
    pytest -m weights tests/test_weights.py

Each test skips when its env var is unset, so the suite stays hermetic by
default (pytest.ini deselects -m weights).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.weights

PROMPTS = ["a photograph of a red fox in snow",
           "an oil painting of a lighthouse at dusk",
           "macro shot of a dew-covered spider web"]


def _need(var):
    path = os.environ.get(var)
    if not path or not os.path.exists(path):
        pytest.skip(f"{var} not set / not found")
    return path


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                              * np.linalg.norm(b, axis=-1))


def test_clip_vitb32_cosine_vs_torch():
    path = _need("APHANTASIA_CLIP_PT")
    torch = pytest.importorskip("torch")
    from aphantasia_tpu.models.clip.model import (load_clip, encode_image,
                                                  encode_text)
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    params, cfg = load_clip("ViT-B/32", path)
    toks = np.asarray(tokenize(PROMPTS, context_length=cfg.context_length))
    rng = np.random.RandomState(0)
    imgs = rng.rand(3, 3, cfg.image_resolution, cfg.image_resolution
                    ).astype(np.float32)

    ours_t = np.asarray(encode_text(params, cfg, jnp.asarray(toks)))
    ours_i = np.asarray(encode_image(params, cfg, jnp.asarray(imgs)))

    ref = torch.jit.load(path, map_location="cpu").float().eval()
    with torch.no_grad():
        ref_t = ref.encode_text(torch.as_tensor(toks)).numpy()
        ref_i = ref.encode_image(torch.as_tensor(imgs)).numpy()

    assert _cos(ours_t, ref_t).min() >= 0.98, _cos(ours_t, ref_t)
    assert _cos(ours_i, ref_i).min() >= 0.98, _cos(ours_i, ref_i)


def test_dav2_vs_transformers():
    path = _need("APHANTASIA_DAV2_PT")
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from aphantasia_tpu.models.depth_anything import InferDepthAny

    infer = InferDepthAny("s", params=None)   # env path converts inside
    rng = np.random.RandomState(1)
    img = rng.rand(1, 3, 14 * 8, 14 * 10).astype(np.float32)
    ours = np.asarray(infer(jnp.asarray(img)))

    hf = transformers.AutoModelForDepthEstimation.from_pretrained(path).eval()
    mean = np.asarray([0.485, 0.456, 0.406])[None, :, None, None]
    std = np.asarray([0.229, 0.224, 0.225])[None, :, None, None]
    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(
            (img - mean) / std, dtype=torch.float32)).predicted_depth.numpy()
    ref = (ref - ref.min()) / (ref.max() - ref.min() + 1e-12)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr >= 0.98, corr


def test_vqgan_decoder_loads_and_decodes():
    path = _need("APHANTASIA_VQGAN_PT")
    from aphantasia_tpu.models.vqgan import (VQGAN_CONFIGS, convert_taming,
                                             vqgan_decode)
    cfg = VQGAN_CONFIGS["imagenet_f16_16384"]
    params = convert_taming(path, cfg)
    z = jnp.zeros((1, cfg.z_channels, 8, 8))
    img = vqgan_decode(params, cfg, z)
    assert img.shape[-2:] == (128, 128)
    assert bool(jnp.isfinite(img).all())
