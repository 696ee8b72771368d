"""Full-size synthetic checkpoint round-trips for every frozen tower.

VERDICT r2 item 5: CLIP already had a full-archive converter test
(tests/test_convert.py); this module generates REAL-SHAPE random
state-dicts with the exact on-disk naming each tower's checkpoint ships
with (the formats the reference auto-downloads: OpenAI CLIP jit archives —
reference clip_fft.py:119; LAION aesthetic Linear head — reference
aphantasia/utils.py:402-413; lpips VGG16 — clip_fft.py:220; HF
Depth-Anything-V2 dirs — reference depth/depth.py:22-25; taming VQGAN
last.ckpt — CLIP_VQGAN.ipynb cell 2), pushes them through the PRODUCTION
converters via `python -m aphantasia_tpu.verify_weights <dir>`, and
asserts every tower row reports converted/verified.

Where torch can execute the source checkpoint (DA-V2 via transformers,
aesthetic via plain matmul), verify_weights computes real numeric parity
(corr >= 0.98 / max-diff) — so the full-scale converter path, not just the
tiny-random goldens, is exercised on every CI run.
"""
import io
import contextlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)


# ---------------------------------------------------------------- builders

def build_aesthetic(path):
    """LAION sa_0_4_vit_b_32_linear.pth: a bare Linear(512,1) state_dict."""
    torch.manual_seed(0)
    sd = {"weight": torch.randn(1, 512) * 0.02, "bias": torch.randn(1) * 0.01}
    torch.save(sd, str(path))


def build_lpips(path):
    """Full torchvision VGG16 `features.*` + lpips `lin*.model.1.weight`
    heads in one file (the layout models/lpips.py:lpips_get documents)."""
    from aphantasia_tpu.models.lpips import VGG_CFG, TAP_CHANNELS
    torch.manual_seed(1)
    sd = {}
    cin, idx = 3, 0
    for v in VGG_CFG:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn(v, cin, 3, 3) * (
            2.0 / (9 * cin)) ** 0.5
        sd[f"features.{idx}.bias"] = torch.zeros(v)
        cin = v
        idx += 2
    for i, c in enumerate(TAP_CHANNELS):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1) / c
    torch.save(sd, str(path))


def build_dav2_dir(path):
    """Real-shape Depth-Anything-V2-Small HF directory via save_pretrained
    (hidden 384, 12 layers, taps [3,6,9,12] 1-based = our (2,5,8,11))."""
    transformers = pytest.importorskip("transformers")
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation)
    bb = dict(hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
              intermediate_size=1536, image_size=518, patch_size=14,
              out_indices=[3, 6, 9, 12], apply_layernorm=True,
              reshape_hidden_states=False)
    cfg = DepthAnythingConfig(
        backbone_config={"model_type": "dinov2", **bb},
        fusion_hidden_size=64, patch_size=14, reassemble_hidden_size=384,
        neck_hidden_sizes=[48, 96, 192, 384], head_hidden_size=32,
        reassemble_factors=[4, 2, 1, 0.5])
    torch.manual_seed(2)
    model = DepthAnythingForDepthEstimation(cfg).eval()
    model.save_pretrained(str(path))
    return model


def taming_gumbel_sd():
    """Full-size gumbel_f8 decoder state_dict with exact taming naming
    (decoder.* / post_quant_conv.*), shapes from VQGAN_CONFIGS."""
    from aphantasia_tpu.models.vqgan import VQGAN_CONFIGS
    cfg = VQGAN_CONFIGS["gumbel_f8_8192"]
    g = torch.Generator().manual_seed(3)
    sd = {}

    def conv(name, cin, cout, k):
        fan = k * k * cin
        sd[name + ".weight"] = torch.randn(
            cout, cin, k, k, generator=g) * (2.0 / fan) ** 0.5
        sd[name + ".bias"] = torch.zeros(cout)

    def norm(name, c):
        sd[name + ".weight"] = torch.ones(c)
        sd[name + ".bias"] = torch.zeros(c)

    def res(name, cin, cout):
        norm(name + ".norm1", cin)
        conv(name + ".conv1", cin, cout, 3)
        norm(name + ".norm2", cout)
        conv(name + ".conv2", cout, cout, 3)
        if cin != cout:
            conv(name + ".nin_shortcut", cin, cout, 1)

    def attn(name, c):
        norm(name + ".norm", c)
        for p in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{p}", c, c, 1)

    block_in = cfg.ch * cfg.ch_mult[-1]
    conv("post_quant_conv", cfg.z_channels, cfg.z_channels, 1)
    conv("decoder.conv_in", cfg.z_channels, block_in, 3)
    res("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in)
    cur = block_in
    for level in reversed(range(len(cfg.ch_mult))):
        cout = cfg.ch * cfg.ch_mult[level]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{level}.block.{j}", cur, cout)
            cur = cout
        if level == len(cfg.ch_mult) - 1:
            # real gumbel f8 has attn blocks at the coarsest level
            for j in range(cfg.num_res_blocks + 1):
                attn(f"decoder.up.{level}.attn.{j}", cur)
        if level != 0:
            conv(f"decoder.up.{level}.upsample.conv", cur, cur, 3)
    norm("decoder.norm_out", cur)
    conv("decoder.conv_out", cur, cfg.out_ch, 3)
    return sd


def build_vqgan(path):
    torch.save({"state_dict": taming_gumbel_sd()}, str(path))


def openai_vitb32_sd():
    """Full-size ViT-B/32 state_dict in OpenAI naming (random weights)."""
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS
    cfg = CLIP_CONFIGS["ViT-B/32"]
    g = torch.Generator().manual_seed(4)
    sd = {}

    def r(*shape, scale=0.02):
        return torch.randn(*shape, generator=g) * scale

    def block(prefix, d):
        sd[prefix + ".ln_1.weight"] = torch.ones(d)
        sd[prefix + ".ln_1.bias"] = torch.zeros(d)
        sd[prefix + ".attn.in_proj_weight"] = r(3 * d, d)
        sd[prefix + ".attn.in_proj_bias"] = torch.zeros(3 * d)
        sd[prefix + ".attn.out_proj.weight"] = r(d, d)
        sd[prefix + ".attn.out_proj.bias"] = torch.zeros(d)
        sd[prefix + ".ln_2.weight"] = torch.ones(d)
        sd[prefix + ".ln_2.bias"] = torch.zeros(d)
        sd[prefix + ".mlp.c_fc.weight"] = r(4 * d, d)
        sd[prefix + ".mlp.c_fc.bias"] = torch.zeros(4 * d)
        sd[prefix + ".mlp.c_proj.weight"] = r(d, 4 * d)
        sd[prefix + ".mlp.c_proj.bias"] = torch.zeros(d)

    vd, p = cfg.vision_width, cfg.vision_patch_size
    sd["visual.conv1.weight"] = r(vd, 3, p, p)
    sd["visual.class_embedding"] = r(vd)
    np_tok = (cfg.image_resolution // p) ** 2 + 1
    sd["visual.positional_embedding"] = r(np_tok, vd)
    sd["visual.ln_pre.weight"] = torch.ones(vd)
    sd["visual.ln_pre.bias"] = torch.zeros(vd)
    for i in range(cfg.vision_layers):
        block(f"visual.transformer.resblocks.{i}", vd)
    sd["visual.ln_post.weight"] = torch.ones(vd)
    sd["visual.ln_post.bias"] = torch.zeros(vd)
    sd["visual.proj"] = r(vd, cfg.embed_dim)
    td = cfg.transformer_width
    sd["token_embedding.weight"] = r(cfg.vocab_size, td)
    sd["positional_embedding"] = r(cfg.context_length, td)
    for i in range(cfg.transformer_layers):
        block(f"transformer.resblocks.{i}", td)
    sd["ln_final.weight"] = torch.ones(td)
    sd["ln_final.bias"] = torch.zeros(td)
    sd["text_projection"] = r(td, cfg.embed_dim)
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07), dtype=torch.float32)
    return sd


def build_clip(path):
    from test_convert import save_jit_archive
    save_jit_archive(openai_vitb32_sd(), path)


# ------------------------------------------------------------------ tests

@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("full_ckpts")
    build_aesthetic(d / "sa_0_4_vit_b_32_linear.pth")
    build_lpips(d / "lpips_vgg16.pt")
    build_dav2_dir(d / "depth_anything_v2_small")
    build_vqgan(d / "vqgan_gumbel_f8.ckpt")
    build_clip(d / "ViT-B-32.pt")
    return d


def test_verify_weights_full_dir(ckpt_dir):
    """The one-command verifier converts + verifies every tower at full
    checkpoint scale (VERDICT r2 item 5 'Done' criterion)."""
    from aphantasia_tpu import verify_weights

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = verify_weights.main([str(ckpt_dir)])
    out = buf.getvalue()
    print(out)
    assert rc == 0, out
    assert "MISSING" not in out, out
    assert "FAILED" not in out, out
    # the towers torch can execute must reach *verified*, not just converted
    for comp in ("clip ViT-B/32", "aesthetic", "depth-anything-v2"):
        line = next(l for l in out.splitlines() if l.strip().startswith(comp))
        assert "verified" in line, out


def test_dav2_full_scale_parity(ckpt_dir):
    """Direct full-size corr check vs the torch HF model (tighter than the
    verify table: asserts the converted small tower matches transformers'
    forward at real scale, not the tiny test_depth golden)."""
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp
    from aphantasia_tpu.models.depth_anything import InferDepthAny
    from aphantasia_tpu.models.depth_anything.convert import convert_hf_dav2

    path = str(ckpt_dir / "depth_anything_v2_small")
    params = convert_hf_dav2(path)
    infer = InferDepthAny("s", params=params)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 14 * 6, 14 * 8).astype(np.float32)
    ours = np.asarray(infer(jnp.asarray(img)))

    hf = transformers.AutoModelForDepthEstimation.from_pretrained(path).eval()
    mean = np.asarray([0.485, 0.456, 0.406])[None, :, None, None]
    std = np.asarray([0.229, 0.224, 0.225])[None, :, None, None]
    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(
            (img - mean) / std, dtype=torch.float32)).predicted_depth.numpy()
    ref = (ref - ref.min()) / (ref.max() - ref.min() + 1e-12)
    corr = float(np.corrcoef(ours.ravel(), ref.ravel())[0, 1])
    assert corr >= 0.98, corr


TEXT_KEYS = ("token_embedding.weight", "positional_embedding",
             "ln_final.weight", "ln_final.bias", "text_projection")


def custom_text_sd(sd):
    """Rewrap an OpenAI-naming state dict as open_clip CustomTextCLIP:
    the text tower moves into a `text.` submodule, visual/logit_scale
    keep classic names."""
    out = {}
    for k, v in sd.items():
        if k.startswith("transformer.resblocks.") or k in TEXT_KEYS:
            out["text." + k] = v
        else:
            out[k] = v
    return out


def test_custom_text_clip_rename_shim():
    """VERDICT r4 item 5: the 'text.'-prefixed CustomTextCLIP rename is
    proven by EXACT parameter-tree equality against the plain-format
    conversion of the same tensors — a synthetic rename + equality
    assertion cannot silently misconvert."""
    import jax
    import numpy as np
    from aphantasia_tpu.models.clip.convert import convert_checkpoint

    sd = openai_vitb32_sd()
    plain = convert_checkpoint({k: v for k, v in sd.items()})
    shimmed = convert_checkpoint(custom_text_sd(sd))
    plain_leaves, plain_tree = jax.tree_util.tree_flatten(plain)
    shim_leaves, shim_tree = jax.tree_util.tree_flatten(shimmed)
    assert plain_tree == shim_tree
    for a, b in zip(plain_leaves, shim_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_custom_text_clip_linear_projection():
    """The Linear-text-projection sub-variant: `text.text_projection.weight`
    [embed, width] transposes into the parameter slot; a biased Linear has
    no OpenAI-form slot and must fail loudly."""
    import numpy as np
    import pytest as _pytest
    from aphantasia_tpu.models.clip.convert import convert_checkpoint

    sd = openai_vitb32_sd()
    proj = sd.pop("text_projection")
    lin = custom_text_sd(sd)
    lin["text.text_projection.weight"] = proj.T.contiguous()
    converted = convert_checkpoint(lin)
    np.testing.assert_array_equal(
        np.asarray(converted["text"]["text_projection"]), proj.numpy())

    lin["text.text_projection.bias"] = torch.zeros(proj.shape[1])
    with _pytest.raises(ValueError, match="biased Linear text projection"):
        convert_checkpoint(lin)


def test_vqgan_full_scale_decode(ckpt_dir):
    """Full-size taming gumbel checkpoint through the production converter
    and a decode at the notebook's latent shape."""
    import jax.numpy as jnp
    from aphantasia_tpu.models.vqgan import (VQGAN_CONFIGS, convert_taming,
                                             vqgan_decode)
    cfg = VQGAN_CONFIGS["gumbel_f8_8192"]
    params = convert_taming(str(ckpt_dir / "vqgan_gumbel_f8.ckpt"), cfg)
    z = jnp.asarray(np.random.RandomState(1).randn(
        1, cfg.z_channels, 8, 8), jnp.float32)
    img = vqgan_decode(params, cfg, z)
    assert img.shape == (1, 3, 64, 64)
    assert bool(jnp.isfinite(img).all())
    # post_quant path present too (quantized-latent decode semantics)
    img2 = vqgan_decode(params, cfg, z, use_post_quant=True)
    assert bool(jnp.isfinite(img2).all())
