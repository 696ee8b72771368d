"""CLIP checkpoint-converter hardening (VERDICT r1 item 3, hermetic half).

Builds a REAL TorchScript jit archive whose state_dict uses the exact
OpenAI CLIP naming (the file format `clip.load` ships — reference
clip_fft.py:119), by reverse-mapping a tiny HuggingFace CLIPModel's
weights into OpenAI layout.  The archive goes through the full
`convert_checkpoint` path (torch.jit.load -> dispatch -> convert) and the
result must equal the HF-converted tree exactly — which pins the OpenAI
key mapping, the qkv merge and every transpose against an independently
correct layout.  The network-requiring half lives in test_weights.py
(-m weights).
"""
import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)

from aphantasia_tpu.models.clip.convert import (
    convert_checkpoint, convert_hf_clip, convert_openai_checkpoint)
from aphantasia_tpu.models.clip.model import CLIPConfig, CLIP_CONFIGS


def tiny_hf_model():
    from transformers import CLIPConfig as HFConfig, CLIPModel
    hf_cfg = HFConfig(projection_dim=24)
    hf_cfg.text_config.hidden_size = 32
    hf_cfg.text_config.intermediate_size = 128
    hf_cfg.text_config.num_hidden_layers = 2
    hf_cfg.text_config.num_attention_heads = 2
    hf_cfg.text_config.vocab_size = 100
    hf_cfg.text_config.max_position_embeddings = 12
    hf_cfg.text_config.hidden_act = "quick_gelu"
    hf_cfg.vision_config.hidden_size = 32
    hf_cfg.vision_config.intermediate_size = 128
    hf_cfg.vision_config.num_hidden_layers = 2
    hf_cfg.vision_config.num_attention_heads = 2
    hf_cfg.vision_config.image_size = 16
    hf_cfg.vision_config.patch_size = 8
    hf_cfg.vision_config.hidden_act = "quick_gelu"
    torch.manual_seed(7)
    return CLIPModel(hf_cfg).eval()


def hf_to_openai_sd(model):
    """Reverse-map an HF CLIPModel state_dict to OpenAI CLIP naming."""
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    out = {}

    def blocks(src, dst, n):
        for i in range(n):
            s = f"{src}.encoder.layers.{i}"
            d = f"{dst}.resblocks.{i}"
            out[d + ".ln_1.weight"] = sd[s + ".layer_norm1.weight"]
            out[d + ".ln_1.bias"] = sd[s + ".layer_norm1.bias"]
            out[d + ".attn.in_proj_weight"] = torch.cat(
                [sd[s + f".self_attn.{p}_proj.weight"] for p in "qkv"], 0)
            out[d + ".attn.in_proj_bias"] = torch.cat(
                [sd[s + f".self_attn.{p}_proj.bias"] for p in "qkv"], 0)
            out[d + ".attn.out_proj.weight"] = sd[s + ".self_attn.out_proj.weight"]
            out[d + ".attn.out_proj.bias"] = sd[s + ".self_attn.out_proj.bias"]
            out[d + ".ln_2.weight"] = sd[s + ".layer_norm2.weight"]
            out[d + ".ln_2.bias"] = sd[s + ".layer_norm2.bias"]
            out[d + ".mlp.c_fc.weight"] = sd[s + ".mlp.fc1.weight"]
            out[d + ".mlp.c_fc.bias"] = sd[s + ".mlp.fc1.bias"]
            out[d + ".mlp.c_proj.weight"] = sd[s + ".mlp.fc2.weight"]
            out[d + ".mlp.c_proj.bias"] = sd[s + ".mlp.fc2.bias"]

    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd["vision_model.embeddings.position_embedding.weight"]
    out["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    blocks("vision_model", "visual.transformer", 2)
    out["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].t().contiguous()
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    blocks("text_model", "transformer", 2)
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].t().contiguous()
    out["logit_scale"] = sd["logit_scale"]
    return out


def save_jit_archive(sd, path):
    """Wrap a dotted-name state_dict in nested ScriptModules and jit-save —
    produces the same container format as OpenAI's released .pt files."""

    class Leaf(torch.nn.Module):
        def forward(self):
            return torch.zeros(1)

    root = Leaf()
    for name, tensor in sd.items():
        parts = name.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                mod.add_module(p, Leaf())
            mod = getattr(mod, p)
        # fp16 storage like the real OpenAI archives (LNs stay fp32 there,
        # but converting everything exercises the .float() upcast)
        mod.register_parameter(
            parts[-1], torch.nn.Parameter(tensor.half(), requires_grad=False))
    torch.jit.save(torch.jit.script(root), str(path))


def test_openai_jit_archive_roundtrip(tmp_path):
    model = tiny_hf_model()
    oai_sd = hf_to_openai_sd(model)
    path = tmp_path / "tiny_openai_clip.pt"
    save_jit_archive(oai_sd, path)

    got = convert_checkpoint(str(path))      # jit.load -> dispatch -> openai
    want = convert_hf_clip(model)

    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_g) == len(flat_w)
    for path_k, leaf in flat_g:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_w[path_k]), atol=2e-3,
            err_msg=jax.tree_util.keystr(path_k))  # fp16 storage tolerance


def test_hf_state_dict_dispatch():
    model = tiny_hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    got = convert_checkpoint(sd)              # HF naming -> hf converter
    want = convert_hf_clip(model)
    a = jax.tree_util.tree_leaves(got)
    b = jax.tree_util.tree_leaves(want)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_wrong_model_raises_readable_error(tmp_path):
    model = tiny_hf_model()
    oai_sd = hf_to_openai_sd(model)
    path = tmp_path / "tiny.pt"
    save_jit_archive(oai_sd, path)
    with pytest.raises(ValueError, match="does not match CLIP model"):
        convert_checkpoint(str(path), expect_cfg=CLIP_CONFIGS["ViT-B/32"])


def test_plain_state_dict_pt_open_clip_format(tmp_path):
    """open_clip saves plain `torch.save(model.state_dict())` .pt files in
    the OpenAI naming (no jit archive).  _read_state_dict's torch.load
    fallback must convert them identically to the jit-archive path (r4 —
    widens real-weight readiness beyond OpenAI's own downloads)."""
    torch = pytest.importorskip("torch")
    model = tiny_hf_model()
    sd = hf_to_openai_sd(model)
    path = str(tmp_path / "open_clip_vitb.pt")
    torch.save(sd, path)
    got = convert_checkpoint(path)
    want = convert_checkpoint({k: v.numpy() for k, v in sd.items()})
    for x, y in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
