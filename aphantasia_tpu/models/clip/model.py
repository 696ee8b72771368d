"""OpenAI-CLIP architecture family in pure functional JAX.

Covers every model the reference can select (clip_fft.py:33, illustra.py:27):
ViT-B/32, ViT-B/16, ViT-L/14[@336px] and the ModifiedResNet family RN50,
RN101, RN50x4, RN50x16, RN50x64.  Params are nested dicts of jnp arrays;
`encode_image` / `encode_text` are pure jittable functions.

TPU-first choices: patchify is a reshape+matmul (MXU) instead of a conv;
attention uses `jax.nn.dot_product_attention`; layernorms run in fp32 while
matmuls run in a configurable compute dtype (bf16 by default on TPU).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    image_resolution: int
    vision_layers: Any          # int (ViT) or 4-tuple (ModifiedResNet)
    vision_width: int
    vision_patch_size: int      # 0 for ResNet
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    vision_heads_override: int = 0  # for tiny test configs

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.vision_heads_override:
            return self.vision_heads_override
        return self.vision_width // 64 if self.is_vit else self.vision_width * 32 // 64


CLIP_CONFIGS = {
    "ViT-B/32": CLIPConfig("ViT-B/32", 512, 224, 12, 768, 32),
    "ViT-B/16": CLIPConfig("ViT-B/16", 512, 224, 12, 768, 16),
    "ViT-L/14": CLIPConfig("ViT-L/14", 768, 224, 24, 1024, 14,
                           transformer_width=768, transformer_heads=12),
    "ViT-L/14@336px": CLIPConfig("ViT-L/14@336px", 768, 336, 24, 1024, 14,
                                 transformer_width=768, transformer_heads=12),
    "RN50": CLIPConfig("RN50", 1024, 224, (3, 4, 6, 3), 64, 0),
    "RN101": CLIPConfig("RN101", 512, 224, (3, 4, 23, 3), 64, 0),
    "RN50x4": CLIPConfig("RN50x4", 640, 288, (4, 6, 10, 6), 80, 0,
                         transformer_width=640, transformer_heads=10),
    "RN50x16": CLIPConfig("RN50x16", 768, 384, (6, 8, 18, 8), 96, 0,
                          transformer_width=768, transformer_heads=12),
    "RN50x64": CLIPConfig("RN50x64", 1024, 448, (3, 15, 36, 10), 128, 0,
                          transformer_width=1024, transformer_heads=16),
}

# sample-budget multipliers per model — constant-memory heuristic
# (reference clip_fft.py:125-127; illustra.py:97 adds ViT-L/RN50x64)
XMEM = {"ViT-B/16": 0.25, "ViT-L/14": 0.04, "RN50": 0.5, "RN50x4": 0.16,
        "RN50x16": 0.06, "RN50x64": 0.01, "RN101": 0.33}


# ------------------------------------------------------------------ layers

# Read once at import (like the other kernel toggles): a per-call read is
# trace-time-bound anyway — a jit cache populated under one env setting
# keeps serving that path after the variable changes, which confuses
# in-process A/Bs.  Import-time read makes the binding explicit.
import os as _os
_PALLAS_LN = _os.environ.get("APHANTASIA_PALLAS_LN") == "1"


def layer_norm(x, p, eps=1e-5):
    # Pallas fused path (opt-in APHANTASIA_PALLAS_LN=1): the r4 profile
    # put the 24 fwd+bwd LNs at 3.83 ms/step because XLA materializes the
    # f32-converted activations around each reduction; the kernel keeps
    # the f32 math register-resident (ops/pallas_ln.py)
    if _PALLAS_LN:
        from aphantasia_tpu.ops.pallas_ln import layer_norm_fused, eligible
        if eligible(x, p["g"]):
            return layer_norm_fused(x, p["g"], p["b"], eps)
    # one-pass moments (E[x^2]-E[x]^2): a single fused reduction instead of
    # two chained ones; LN inputs are centered activations, so the
    # cancellation risk of the one-pass form is negligible at fp32
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# Fused Pallas attention core (ops/pallas_attn.py): on by default on TPU,
# where the XLA lowering of mha spends most of its time on [B,T,H,hd]
# layout transposes and HBM-materialized score tensors.  Projections stay
# in XLA (big batched matmuls), so all gradients remain exact.
FUSED_ATTN = True


def _fused_attn_active() -> bool:
    return FUSED_ATTN and jax.default_backend() in ("tpu", "axon")


def mha(x, p, n_heads, mask=None, causal=False, valid_t=None):
    """Multi-head self-attention with merged-qkv torch layout.

    `mask`/`causal`: the only mask this model family uses is the text
    tower's causal tril (CLIP model.py build_attention_mask), so `causal`
    fully describes it for the fused path.  `valid_t` marks the real token
    count when the tower pre-padded T (see `_pad_tokens`)."""
    b, t, d = x.shape
    qkv = x @ p["in_w"].astype(x.dtype) + p["in_b"].astype(x.dtype)  # [b,t,3d]
    if _fused_attn_active():
        from aphantasia_tpu.ops.pallas_attn import attention_core
        o = attention_core(qkv, n_heads, causal or mask is not None, valid_t)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // n_heads
        q = q.reshape(b, t, n_heads, hd)
        k = k.reshape(b, t, n_heads, hd)
        v = v.reshape(b, t, n_heads, hd)
        if mask is None and causal:
            mask = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]
        o = jax.nn.dot_product_attention(q, k, v, mask=mask)
        o = o.reshape(b, t, d)
    return o @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


def mha_flat(x, p, n_heads, t):
    """mha over the flat sample-major stream [b*t, d] (fused path only):
    projections run un-padded; only the kernel sees the sample structure.

    APHANTASIA_ATTN_PADDED=1 routes the core through the token-padded
    kernel instead: the [b*t,3d]->[b,t,3d] reshape is a free row-major
    bitcast, and the padded kernel's small aligned blocks (see
    _geometry / APHANTASIA_ATTN_PAD_ROWS) trade a per-layer t->t_pad
    pad/unpad HBM copy for much less score overcompute."""
    import os
    from aphantasia_tpu.ops.pallas_attn import (attention_core,
                                                attention_core_flat)
    qkv = x @ p["in_w"].astype(x.dtype) + p["in_b"].astype(x.dtype)
    if os.environ.get("APHANTASIA_ATTN_PADDED") == "1":
        r, d3 = qkv.shape
        o = attention_core(qkv.reshape(r // t, t, d3), n_heads, False, None)
        o = o.reshape(r, d3 // 3)
    else:
        o = attention_core_flat(qkv, n_heads, t)
    return o @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


def resblock_flat(x, p, n_heads, t):
    x = x + mha_flat(layer_norm(x, p["ln_1"]), p["attn"], n_heads, t)
    h = layer_norm(x, p["ln_2"])
    h = quick_gelu(h @ p["mlp"]["fc_w"].astype(x.dtype) + p["mlp"]["fc_b"].astype(x.dtype))
    h = h @ p["mlp"]["proj_w"].astype(x.dtype) + p["mlp"]["proj_b"].astype(x.dtype)
    return x + h


def transformer_flat(x, blocks, n_heads, t):
    import os
    if os.environ.get("APHANTASIA_FUSED_BLOCK") == "1":
        # fused half-block kernels (ops/pallas_block.py): LN + projections
        # folded around the attention core / MLP so per-layer activations
        # never round-trip HBM; weights stay VMEM-resident across row
        # blocks.  Opt-in until TPU-validated.
        from aphantasia_tpu.ops.pallas_block import resblock_flat_fused
        from aphantasia_tpu.ops.pallas_attn import flat_geometry
        bb = flat_geometry(t, x.dtype)
        for p in blocks:
            x = resblock_flat_fused(x, p, n_heads, t, bb)
        return x
    for p in blocks:
        x = resblock_flat(x, p, n_heads, t)
    return x


def resblock(x, p, n_heads, mask=None, causal=False, valid_t=None):
    x = x + mha(layer_norm(x, p["ln_1"]), p["attn"], n_heads, mask,
                causal=causal, valid_t=valid_t)
    h = layer_norm(x, p["ln_2"])
    h = quick_gelu(h @ p["mlp"]["fc_w"].astype(x.dtype) + p["mlp"]["fc_b"].astype(x.dtype))
    h = h @ p["mlp"]["proj_w"].astype(x.dtype) + p["mlp"]["proj_b"].astype(x.dtype)
    return x + h


def transformer(x, blocks, n_heads, mask=None, causal=False, valid_t=None):
    for p in blocks:
        x = resblock(x, p, n_heads, mask, causal=causal, valid_t=valid_t)
    return x


def _padded_t(t: int, dtype) -> int:
    """T padded to the sublane tile of `dtype` (the fused attention kernel's
    sample-merge needs tile-aligned rows)."""
    tile = 16 if dtype == jnp.bfloat16 else 8
    return -(-t // tile) * tile


def _pad_tokens(x):
    """Pad T once for the whole block stack (fused path): padded rows mix
    with real rows only through attention keys, which the fused kernel
    masks via valid_t — LN/MLP/residual are row-local, so garbage in the
    pad rows never reaches real rows.  Returns (x_padded, valid_t).

    NOTE (vision tower): prefer folding the pad into the embedding concat
    (see vit_encode) — a mid-tower pad op skews XLA layout assignment."""
    t = x.shape[1]
    t_pad = _padded_t(t, x.dtype)
    if t_pad == t or not _fused_attn_active():
        return x, None
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], t_pad - t, x.shape[-1]), x.dtype)],
        axis=1), t


# ------------------------------------------------------------------ ViT

def vit_encode(params, cfg: CLIPConfig, x, dtype=jnp.float32):
    """x: NCHW normalized images -> [N, embed_dim]."""
    p = cfg.vision_patch_size
    b, c, h, w = x.shape
    gh, gw = h // p, w // p
    x = x.astype(dtype)
    # patchify as reshape+matmul (== conv stride p with no bias)
    x = x.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
    x = x @ params["conv"].astype(dtype)
    cls = jnp.broadcast_to(params["class_emb"].astype(dtype), (b, 1, x.shape[-1]))
    t_real = 1 + x.shape[1]
    d = x.shape[-1]
    from aphantasia_tpu.ops.pallas_attn import flat_geometry
    if _fused_attn_active() and flat_geometry(t_real, dtype) is not None:
        # FLAT residual stream [b*t, d]: zero token padding, so every
        # projection/MLP matmul runs at the real token count (t=50, not the
        # 64-row sublane pad — a 28% flops cut for ViT-B).  This also kills
        # the layout problem the older pre-padded path fought (an axis-1
        # concat/pad drove XLA to a {2,0,1} activation layout): the one
        # reshape here pins the stream to a plain 2D row-major layout that
        # every downstream matmul likes.
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_emb"].astype(dtype)
        x = layer_norm(x, params["ln_pre"])
        xf = x.reshape(b * t_real, d)
        xf = transformer_flat(xf, params["blocks"], cfg.vision_heads, t_real)
        x = xf.reshape(b, t_real, d)
        x = layer_norm(x[:, 0], params["ln_post"])
        return x @ params["proj"].astype(dtype)
    t_pad = _padded_t(t_real, dtype)
    if t_pad != t_real and _fused_attn_active():
        # pre-padded fused path (odd token counts where flat-block alignment
        # would blow VMEM, e.g. ViT-L/14's t=257 — see flat_geometry).
        # dynamic-update-slice instead of concat: an axis-1 concat makes XLA
        # pick a dim1-major {2,0,1} activation layout that the residual
        # chain then carries through every transformer matmul.  Pad rows are
        # key-masked in attention (valid_t) and row-local everywhere else;
        # only the cls row (row 0) is ever read out.
        base = jnp.zeros((b, t_pad, x.shape[-1]), dtype)
        base = jax.lax.dynamic_update_slice(base, cls, (0, 0, 0))
        x = jax.lax.dynamic_update_slice(base, x, (0, 1, 0))
        valid_t = t_real
    else:
        x = jnp.concatenate([cls, x], axis=1)
        valid_t = None
    pos = params["pos_emb"].astype(dtype)
    if valid_t is not None:
        pos = jnp.pad(pos, ((0, x.shape[1] - pos.shape[0]), (0, 0)))
    x = x + pos
    x = layer_norm(x, params["ln_pre"])
    x = transformer(x, params["blocks"], cfg.vision_heads, valid_t=valid_t)
    x = layer_norm(x[:, 0], params["ln_post"])
    return x @ params["proj"].astype(dtype)


# ------------------------------------------------------------------ ModifiedResNet

def _bn(x, p):
    # frozen batchnorm: running-stats affine
    inv = jax.lax.rsqrt(p["v"].astype(jnp.float32) + 1e-5)
    g = (p["g"] * inv).astype(x.dtype)
    b = (p["b"] - p["m"] * p["g"] * inv).astype(x.dtype)
    return x * g + b


def _conv(x, w, stride=1, padding="SAME"):
    # NHWC x HWIO
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def bottleneck(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1_w"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2_w"]), p["bn2"]))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(_conv(out, p["conv3_w"]), p["bn3"])
    if "down_conv_w" in p:
        idn = _avgpool(x, stride) if stride > 1 else x
        idn = _bn(_conv(idn, p["down_conv_w"]), p["down_bn"])
    else:
        idn = x
    return jax.nn.relu(out + idn)


def attnpool(x, p, n_heads):
    """AttentionPool2d: mean-query cross attention (CLIP model.py semantics)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    x = jnp.concatenate([x.mean(1, keepdims=True), x], axis=1)
    x = x + p["pos_emb"].astype(x.dtype)
    q = x[:, :1] @ p["q_w"].astype(x.dtype) + p["q_b"].astype(x.dtype)
    k = x @ p["k_w"].astype(x.dtype) + p["k_b"].astype(x.dtype)
    v = x @ p["v_w"].astype(x.dtype) + p["v_b"].astype(x.dtype)
    hd = c // n_heads
    q = q.reshape(b, 1, n_heads, hd)
    k = k.reshape(b, -1, n_heads, hd)
    v = v.reshape(b, -1, n_heads, hd)
    o = jax.nn.dot_product_attention(q, k, v).reshape(b, 1, c)
    o = o @ p["c_w"].astype(x.dtype) + p["c_b"].astype(x.dtype)
    return o[:, 0]


def resnet_encode(params, cfg: CLIPConfig, x, dtype=jnp.float32):
    x = x.astype(dtype).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    st = params["stem"]
    # explicit (1,1) padding: at stride 2, XLA's SAME pads (0,1) while the
    # OpenAI stem (torch Conv2d padding=1) pads (1,1) — a one-pixel window
    # shift that changes every downstream activation (pinned by the
    # torch-mirror golden in tests/test_clip.py)
    x = jax.nn.relu(_bn(_conv(x, st["conv1_w"], stride=2,
                              padding=((1, 1), (1, 1))), st["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, st["conv2_w"]), st["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, st["conv3_w"]), st["bn3"]))
    x = _avgpool(x, 2)
    for i, stage in enumerate(params["layers"]):
        for j, blk in enumerate(stage):
            stride = 2 if (i > 0 and j == 0) else 1
            x = bottleneck(x, blk, stride)
    return attnpool(x, params["attnpool"], cfg.vision_heads)


# ------------------------------------------------------------------ text

def text_encode_fn(params, cfg: CLIPConfig, tokens, dtype=jnp.float32):
    t = params["text"]
    x = t["token_embedding"][tokens].astype(dtype)
    x = x + t["positional_embedding"].astype(dtype)
    n = cfg.context_length
    x, valid_t = _pad_tokens(x)      # eot index < n — pad rows unread
    mask = (None if _fused_attn_active()
            else jnp.tril(jnp.ones((n, n), dtype=bool))[None, None])
    x = transformer(x, t["blocks"], cfg.transformer_heads, mask=mask,
                    causal=True, valid_t=valid_t)
    x = x[:, :n]
    x = layer_norm(x, t["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ t["text_projection"].astype(dtype)


# ------------------------------------------------------------------ public API

def encode_image(params, cfg: CLIPConfig, images, dtype=jnp.float32):
    """images: NCHW, already CLIP-normalized. Returns [N, embed_dim]."""
    if cfg.is_vit:
        return vit_encode(params["visual"], cfg, images, dtype)
    return resnet_encode(params["visual"], cfg, images, dtype)


def encode_text(params, cfg: CLIPConfig, tokens, dtype=jnp.float32):
    """tokens: int32 [N, context_length]."""
    return text_encode_fn(params, cfg, tokens, dtype)


# ------------------------------------------------------------------ init

def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _block_init(key, d, mlp_ratio=4):
    ks = jax.random.split(key, 4)
    attn_std = d ** -0.5
    fc_std = (2 * d) ** -0.5
    proj_std = attn_std  # per-layer depth scaling omitted for random fallback
    return {
        "ln_1": _ln_init(d),
        "attn": {
            "in_w": attn_std * jax.random.normal(ks[0], (d, 3 * d)),
            "in_b": jnp.zeros((3 * d,)),
            "out_w": proj_std * jax.random.normal(ks[1], (d, d)),
            "out_b": jnp.zeros((d,)),
        },
        "ln_2": _ln_init(d),
        "mlp": {
            "fc_w": fc_std * jax.random.normal(ks[2], (d, mlp_ratio * d)),
            "fc_b": jnp.zeros((mlp_ratio * d,)),
            "proj_w": proj_std * jax.random.normal(ks[3], (mlp_ratio * d, d)),
            "proj_b": jnp.zeros((d,)),
        },
    }


def _bn_init(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,)),
            "m": jnp.zeros((d,)), "v": jnp.ones((d,))}


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout)) * np.sqrt(2.0 / fan_in)


def _vit_visual_init(key, cfg: CLIPConfig):
    d, p = cfg.vision_width, cfg.vision_patch_size
    g = cfg.image_resolution // p
    ks = jax.random.split(key, cfg.vision_layers + 4)
    scale = d ** -0.5
    return {
        "conv": scale * jax.random.normal(ks[0], (3 * p * p, d)),
        "class_emb": scale * jax.random.normal(ks[1], (d,)),
        "pos_emb": scale * jax.random.normal(ks[2], (g * g + 1, d)),
        "ln_pre": _ln_init(d),
        "blocks": [_block_init(ks[3 + i], d) for i in range(cfg.vision_layers)],
        "ln_post": _ln_init(d),
        "proj": scale * jax.random.normal(ks[-1], (d, cfg.embed_dim)),
    }


def _resnet_visual_init(key, cfg: CLIPConfig):
    w = cfg.vision_width
    blocks_per = cfg.vision_layers
    keys = iter(jax.random.split(key, 4 + sum(blocks_per) * 4 + 8))
    stem = {
        "conv1_w": _conv_init(next(keys), 3, 3, 3, w // 2), "bn1": _bn_init(w // 2),
        "conv2_w": _conv_init(next(keys), 3, 3, w // 2, w // 2), "bn2": _bn_init(w // 2),
        "conv3_w": _conv_init(next(keys), 3, 3, w // 2, w), "bn3": _bn_init(w),
    }
    layers = []
    inplanes = w
    for i, nb in enumerate(blocks_per):
        planes = w * (2 ** i)
        stage = []
        for j in range(nb):
            blk = {
                "conv1_w": _conv_init(next(keys), 1, 1, inplanes, planes),
                "bn1": _bn_init(planes),
                "conv2_w": _conv_init(next(keys), 3, 3, planes, planes),
                "bn2": _bn_init(planes),
                "conv3_w": _conv_init(next(keys), 1, 1, planes, planes * 4),
                "bn3": _bn_init(planes * 4),
            }
            if j == 0 and (i > 0 or inplanes != planes * 4):
                blk["down_conv_w"] = _conv_init(next(keys), 1, 1, inplanes, planes * 4)
                blk["down_bn"] = _bn_init(planes * 4)
            stage.append(blk)
            inplanes = planes * 4
        layers.append(stage)
    embed = w * 32
    spacial = cfg.image_resolution // 32
    scale = embed ** -0.5
    attnp = {
        "pos_emb": scale * jax.random.normal(next(keys), (spacial * spacial + 1, embed)),
        "q_w": scale * jax.random.normal(next(keys), (embed, embed)), "q_b": jnp.zeros((embed,)),
        "k_w": scale * jax.random.normal(next(keys), (embed, embed)), "k_b": jnp.zeros((embed,)),
        "v_w": scale * jax.random.normal(next(keys), (embed, embed)), "v_b": jnp.zeros((embed,)),
        "c_w": scale * jax.random.normal(next(keys), (embed, cfg.embed_dim)),
        "c_b": jnp.zeros((cfg.embed_dim,)),
    }
    return {"stem": stem, "layers": layers, "attnpool": attnp}


@functools.partial(jax.jit, static_argnums=(1,))
def clip_init(key: jax.Array, cfg: CLIPConfig):
    """Random-weight CLIP with the exact architecture shapes (hermetic
    fallback when no OpenAI checkpoint is available; same FLOPs for bench).

    Jitted: eagerly, the ~150M-element tree is hundreds of separate RNG
    dispatches (~30s of CLI startup through the tunneled runtime); as one
    program it is a single dispatch and the compile is cached persistently."""
    kv, kt, ke, kp = jax.random.split(key, 4)
    tw = cfg.transformer_width
    tkeys = jax.random.split(kt, cfg.transformer_layers)
    visual = (_vit_visual_init(kv, cfg) if cfg.is_vit
              else _resnet_visual_init(kv, cfg))
    text = {
        "token_embedding": 0.02 * jax.random.normal(ke, (cfg.vocab_size, tw)),
        "positional_embedding": 0.01 * jax.random.normal(kp, (cfg.context_length, tw)),
        "blocks": [_block_init(k, tw) for k in tkeys],
        "ln_final": _ln_init(tw),
        "text_projection": tw ** -0.5 * jax.random.normal(kp, (tw, cfg.embed_dim)),
    }
    return {"visual": visual, "text": text,
            "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32)}


def load_clip(name: str, weights_path: str | None = None, key=None):
    """Load a CLIP model: (params, cfg).

    `weights_path` may point to an OpenAI checkpoint (.pt, jit archive or
    state_dict) — converted via models/clip/convert.py.  Without weights a
    random init is returned (shapes/FLOPs identical).
    """
    from aphantasia_tpu.weights import env_weights, warn_random

    cfg = CLIP_CONFIGS[name]
    weights_path = env_weights("clip", weights_path)
    if weights_path is not None:
        from aphantasia_tpu.models.clip.convert import convert_checkpoint
        return convert_checkpoint(weights_path, expect_cfg=cfg), cfg
    warn_random(f"clip {name}")
    if key is None:
        key = jax.random.PRNGKey(0)
    return clip_init(key, cfg), cfg


def input_resolution(name: str) -> int:
    """CLIP input size, with the reference's fallbacks (clip_fft.py:120-123)."""
    if name in CLIP_CONFIGS:
        return CLIP_CONFIGS[name].image_resolution
    return 288 if name == "RN50x4" else 384 if name == "RN50x16" else 224
