"""CLIP architecture parity vs HuggingFace transformers (tiny random model).

transformers.CLIPModel with hidden_act='quick_gelu' computes the exact OpenAI
CLIP forward, so a tiny random-initialized HF model is a proper golden for
our pure-JAX towers + the HF weight converter.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.models.clip.model import (
    CLIPConfig, CLIP_CONFIGS, clip_init, encode_image, encode_text)
from aphantasia_tpu.models.clip.tokenizer import tokenize, SOT, EOT, HashTokenizer

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import CLIPConfig as HFConfig, CLIPModel
    hf_cfg = HFConfig(
        text_config_dict=None,
        projection_dim=24,
    )
    hf_cfg.text_config.hidden_size = 32
    hf_cfg.text_config.intermediate_size = 64
    hf_cfg.text_config.num_hidden_layers = 2
    hf_cfg.text_config.num_attention_heads = 2
    hf_cfg.text_config.vocab_size = 100
    hf_cfg.text_config.max_position_embeddings = 12
    hf_cfg.text_config.hidden_act = "quick_gelu"
    hf_cfg.text_config.eos_token_id = 99
    hf_cfg.vision_config.hidden_size = 32
    hf_cfg.vision_config.intermediate_size = 64
    hf_cfg.vision_config.num_hidden_layers = 2
    hf_cfg.vision_config.num_attention_heads = 2
    hf_cfg.vision_config.image_size = 16
    hf_cfg.vision_config.patch_size = 8
    hf_cfg.vision_config.hidden_act = "quick_gelu"
    torch.manual_seed(0)
    model = CLIPModel(hf_cfg).eval()

    from aphantasia_tpu.models.clip.convert import convert_hf_clip
    params = convert_hf_clip(model)
    cfg = CLIPConfig("tiny", 24, 16, 2, 32, 8, context_length=12, vocab_size=100,
                     transformer_width=32, transformer_heads=2,
                     transformer_layers=2, vision_heads_override=2)
    return model, params, cfg


def test_image_tower_matches_hf(tiny_pair):
    model, params, cfg = tiny_pair
    rs = np.random.RandomState(0)
    imgs = rs.randn(3, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(pixel_values=torch.from_numpy(imgs)).numpy()
    got = np.asarray(encode_image(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_text_tower_matches_hf(tiny_pair):
    model, params, cfg = tiny_pair
    # ids where the eos (=max id 99) position matches argmax semantics
    toks = np.array([[1, 5, 7, 99, 0, 0, 0, 0, 0, 0, 0, 0],
                     [1, 42, 13, 17, 23, 99, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.from_numpy(toks.astype(np.int64))).numpy()
    got = np.asarray(encode_text(params, cfg, jnp.asarray(toks)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_random_init_shapes():
    cfg = CLIP_CONFIGS["ViT-B/32"]
    params = clip_init(jax.random.PRNGKey(0), cfg)
    assert params["visual"]["conv"].shape == (3 * 32 * 32, 768)
    assert params["visual"]["pos_emb"].shape == (50, 768)
    assert params["text"]["token_embedding"].shape == (49408, 512)
    imgs = jnp.zeros((2, 3, 224, 224))
    out = encode_image(params, cfg, imgs)
    assert out.shape == (2, 512)


def test_resnet_encode_shapes():
    cfg = CLIPConfig("rn-tiny", 16, 32, (1, 1, 1, 1), 8, 0,
                     context_length=12, vocab_size=100,
                     transformer_width=16, transformer_heads=2,
                     transformer_layers=1)
    params = clip_init(jax.random.PRNGKey(1), cfg)
    out = encode_image(params, cfg, jnp.zeros((2, 3, 32, 32)))
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_tokenize_shape_and_framing():
    toks = tokenize(["a photo of a cat", "hello"])
    assert toks.shape == (2, 77)
    assert (toks[:, 0] == SOT).all()
    assert (toks == EOT).sum() == 2
    # deterministic
    np.testing.assert_array_equal(toks, tokenize(["a photo of a cat", "hello"]))


def test_hash_tokenizer_stable():
    t = HashTokenizer()
    assert t.encode("hello world") == t.encode("hello world")
    assert t.encode("hello") != t.encode("goodbye")


def test_resnet_tower_matches_torch_mirror():
    """Numeric golden for the ModifiedResNet family (RN50/101/x4/x16/x64
    share this code): a tiny torch mirror of the OpenAI CLIP ResNet
    semantics (3-conv stem with stride-2 first conv + avgpool, bottleneck
    with avgpool-before-conv3 downsampling, mean-query AttentionPool2d),
    weights copied FROM the JAX params.  Binds conv padding placement,
    frozen-BN math and pooling order — the shape test above cannot."""
    import torch.nn as nn
    import torch.nn.functional as F

    cfg = CLIPConfig("rn-tiny", 16, 32, (1, 1, 1, 1), 8, 0,
                     context_length=12, vocab_size=100,
                     transformer_width=16, transformer_heads=2,
                     transformer_layers=1)
    params = jax.device_get(clip_init(jax.random.PRNGKey(1), cfg))
    v = params["visual"]

    def conv(x, w, stride=1, pad=1):
        # torch layout OIHW from our HWIO
        wt = torch.from_numpy(np.asarray(w)).permute(3, 2, 0, 1).contiguous()
        return F.conv2d(x, wt, stride=stride, padding=pad)

    def bn(x, p):
        return F.batch_norm(
            x, torch.from_numpy(np.asarray(p["m"])),
            torch.from_numpy(np.asarray(p["v"])),
            torch.from_numpy(np.asarray(p["g"])),
            torch.from_numpy(np.asarray(p["b"])), False, 0.0, 1e-5)

    def bottleneck_t(x, p, stride):
        out = F.relu(bn(conv(x, p["conv1_w"], pad=0), p["bn1"]))
        out = F.relu(bn(conv(out, p["conv2_w"], pad=1), p["bn2"]))
        if stride > 1:
            out = F.avg_pool2d(out, stride)
        out = bn(conv(out, p["conv3_w"], pad=0), p["bn3"])
        if "down_conv_w" in p:
            idn = F.avg_pool2d(x, stride) if stride > 1 else x
            idn = bn(conv(idn, p["down_conv_w"], pad=0), p["down_bn"])
        else:
            idn = x
        return F.relu(out + idn)

    def attnpool_t(x, p, n_heads):
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).permute(2, 0, 1)           # (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + torch.from_numpy(np.asarray(p["pos_emb"]))[:, None]
        q_w = torch.from_numpy(np.asarray(p["q_w"]))
        k_w = torch.from_numpy(np.asarray(p["k_w"]))
        v_w = torch.from_numpy(np.asarray(p["v_w"]))
        c_w = torch.from_numpy(np.asarray(p["c_w"]))
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x, embed_dim_to_check=c,
            num_heads=n_heads,
            in_proj_weight=None, in_proj_bias=torch.cat([
                torch.from_numpy(np.asarray(p["q_b"])),
                torch.from_numpy(np.asarray(p["k_b"])),
                torch.from_numpy(np.asarray(p["v_b"]))]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=c_w.T.contiguous(),
            out_proj_bias=torch.from_numpy(np.asarray(p["c_b"])),
            use_separate_proj_weight=True,
            q_proj_weight=q_w.T.contiguous(),
            k_proj_weight=k_w.T.contiguous(),
            v_proj_weight=v_w.T.contiguous(),
            training=False, need_weights=False)
        return out[0]

    rs = np.random.RandomState(3)
    imgs = rs.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(imgs)
        st = v["stem"]
        x = F.relu(bn(conv(x, st["conv1_w"], stride=2, pad=1), st["bn1"]))
        x = F.relu(bn(conv(x, st["conv2_w"], pad=1), st["bn2"]))
        x = F.relu(bn(conv(x, st["conv3_w"], pad=1), st["bn3"]))
        x = F.avg_pool2d(x, 2)
        for i, stage in enumerate(v["layers"]):
            for j, blk in enumerate(stage):
                x = bottleneck_t(x, blk, 2 if (i > 0 and j == 0) else 1)
        want = attnpool_t(x, v["attnpool"], cfg.vision_heads).numpy()

    got = np.asarray(encode_image(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
