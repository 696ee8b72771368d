"""VQGAN decoder (taming-transformers architecture) in pure JAX.

Equivalent of the notebook-only VQGAN latent mode (reference
CLIP_VQGAN.ipynb cell 2: `VQModel`/`GumbelVQ` wrapping the taming Decoder;
cell 6 trains a latent `z` [1,256,H/f,W/f] decoded to (decode(z)+1)/2).
Supported configs: imagenet f16 (1024/16384 codebooks) and gumbel f8.

Decoder: conv_in -> mid(ResnetBlock, AttnBlock, ResnetBlock) -> per-level
ResnetBlocks + nearest-2x upsample convs -> GroupNorm -> swish -> conv_out.
Weights convert from taming checkpoints (`convert_taming`); random init
keeps the mode runnable hermetically.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class VQGANConfig:
    name: str
    z_channels: int = 256
    ch: int = 128
    ch_mult: tuple = (1, 1, 2, 2, 4)   # f16
    num_res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    out_ch: int = 3

    @property
    def f(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


VQGAN_CONFIGS = {
    "imagenet_f16_1024": VQGANConfig("imagenet_f16_1024"),
    "imagenet_f16_16384": VQGANConfig("imagenet_f16_16384"),
    "gumbel_f8_8192": VQGANConfig("gumbel_f8_8192", ch_mult=(1, 1, 2, 4),
                                  attn_resolutions=(32,)),
}


def _group_norm(x, p, groups=32, eps=1e-6):
    n, h, w, c = x.shape
    groups = min(groups, c)
    xf = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * p["g"] + p["b"]).astype(x.dtype)


def _conv(x, p, stride=1):
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _resnet_block(x, p):
    h = _conv(_swish(_group_norm(x, p["norm1"])), p["conv1"])
    h = _conv(_swish(_group_norm(h, p["norm2"])), p["conv2"])
    if "nin" in p:
        x = _conv(x, p["nin"])
    return x + h


def _attn_block(x, p):
    n, h, w, c = x.shape
    hn = _group_norm(x, p["norm"])
    q = _conv(hn, p["q"]).reshape(n, h * w, c)
    k = _conv(hn, p["k"]).reshape(n, h * w, c)
    v = _conv(hn, p["v"]).reshape(n, h * w, c)
    attn = jax.nn.softmax(
        jnp.einsum("nqc,nkc->nqk", q, k).astype(jnp.float32) * (c ** -0.5),
        axis=-1).astype(x.dtype)
    out = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c)
    return x + _conv(out, p["proj"])


def _upsample(x, p):
    n, h, w, c = x.shape
    x = jax.image.resize(x, (n, 2 * h, 2 * w, c), "nearest")
    return _conv(x, p)


def vqgan_decode(params, cfg: VQGANConfig, z, dtype=jnp.float32,
                 use_post_quant: bool = False):
    """z: [1, z_channels, h, w] -> image [1,3,H,W] in [0,1].

    Matches the reference notebook's decode exactly: `VQModel.decode(quant)`
    is `self.decoder(quant)` with NO post_quant_conv
    (reference CLIP_VQGAN.ipynb cell 2), then `(x+1)/2` (`vqgan_image`).
    Trained-latent .pt snapshots therefore port between backends.
    `use_post_quant=True` opts into the taming `VQModel.decode` semantics
    (post_quant_conv first) for decoding *quantized* codebook latents.
    """
    x = z.astype(dtype).transpose(0, 2, 3, 1)
    if use_post_quant:
        x = _conv(x, params["post_quant"])
    x = _conv(x, params["conv_in"])
    mid = params["mid"]
    x = _resnet_block(x, mid["block1"])
    x = _attn_block(x, mid["attn"])
    x = _resnet_block(x, mid["block2"])
    for level in reversed(range(len(cfg.ch_mult))):
        lev = params["up"][level]
        attns = lev.get("attns", [])
        # taming interleaves per block: up[l].block[i] then up[l].attn[i]
        # (taming Decoder.forward; attn list, when present, has one entry
        # per res block) — NOT blocks-then-attns (r5 fidelity fix; the
        # pre-r5 ordering also leaked into the torch mirror golden)
        for i, blk in enumerate(lev["blocks"]):
            x = _resnet_block(x, blk)
            if i < len(attns):
                x = _attn_block(x, attns[i])
        if level != 0:
            x = _upsample(x, lev["upsample"])
    x = _conv(_swish(_group_norm(x, params["norm_out"])), params["conv_out"])
    img = (x.transpose(0, 3, 1, 2) + 1.0) / 2.0
    return jnp.clip(img.astype(jnp.float32), 0.0, 1.0)


def _conv_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * np.sqrt(2.0 / fan),
            "b": jnp.zeros((cout,))}


def _norm_init(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


@functools.partial(jax.jit, static_argnums=(1,))
def vqgan_init(key: jax.Array, cfg: VQGANConfig):
    # jitted: one dispatch instead of per-weight RNG dispatches at CLI
    # startup (see clip/model.py clip_init)
    keys = iter(jax.random.split(key, 256))
    block_in = cfg.ch * cfg.ch_mult[-1]

    def res_block(cin, cout):
        p = {"norm1": _norm_init(cin), "conv1": _conv_init(next(keys), 3, 3, cin, cout),
             "norm2": _norm_init(cout), "conv2": _conv_init(next(keys), 3, 3, cout, cout)}
        if cin != cout:
            p["nin"] = _conv_init(next(keys), 1, 1, cin, cout)
        return p

    def attn_block(c):
        return {"norm": _norm_init(c),
                "q": _conv_init(next(keys), 1, 1, c, c),
                "k": _conv_init(next(keys), 1, 1, c, c),
                "v": _conv_init(next(keys), 1, 1, c, c),
                "proj": _conv_init(next(keys), 1, 1, c, c)}

    params = {
        "post_quant": _conv_init(next(keys), 1, 1, cfg.z_channels, cfg.z_channels),
        "conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels, block_in),
        "mid": {"block1": res_block(block_in, block_in),
                "attn": attn_block(block_in),
                "block2": res_block(block_in, block_in)},
        "up": [],
    }
    cur = block_in
    ups = [None] * len(cfg.ch_mult)
    for level in reversed(range(len(cfg.ch_mult))):
        cout = cfg.ch * cfg.ch_mult[level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res_block(cur, cout))
            cur = cout
        lev = {"blocks": blocks}
        # structural parity with the real checkpoints (r5): taming puts
        # one attn per res block at levels whose TRAIN-time resolution is
        # in attn_resolutions — at the 256-trained configs that is
        # exactly the coarsest level (256/16=16, 256/8=32), matching what
        # convert_taming reads from real f16/gumbel files.  Random-init
        # runs and benches now carry the same FLOPs as real weights.
        if cfg.attn_resolutions and level == len(cfg.ch_mult) - 1:
            lev["attns"] = [attn_block(cur)
                            for _ in range(cfg.num_res_blocks + 1)]
        if level != 0:
            lev["upsample"] = _conv_init(next(keys), 3, 3, cur, cur)
        ups[level] = lev
    params["up"] = ups
    params["norm_out"] = _norm_init(cur)
    params["conv_out"] = _conv_init(next(keys), 3, 3, cur, cfg.out_ch)
    return params


def latent_init(key: jax.Array, cfg: VQGANConfig, size) -> jnp.ndarray:
    """Trainable z for output size (H, W) (notebook `latents` cell)."""
    h, w = size
    return 0.1 * jax.random.normal(
        key, (1, cfg.z_channels, h // cfg.f, w // cfg.f), jnp.float32)


@dataclasses.dataclass(frozen=True)
class VQGANParameterizer:
    """Latent-z generator wrapping a frozen decoder.

    `compute_dtype`: decoder conv precision — "auto" = bf16 on TPU
    (activations + weights; GroupNorm moments and the attn softmax stay
    f32 inside their blocks, final image cast back to f32), f32
    elsewhere.  Same pattern/env-override as FFTParameterizer
    (APHANTASIA_DECODE_F32=1 forces f32).  Measured on-chip r5: the f32
    default left the whole decoder off the bf16 MXU path — see
    docs/TPU_MEASUREMENTS_r5.md §5."""
    size: tuple
    cfg: VQGANConfig
    decoder_params: dict = dataclasses.field(hash=False, default=None)
    compute_dtype: object = "auto"

    def __hash__(self):
        return hash((self.size, self.cfg, str(self.compute_dtype)))

    def init(self, key: jax.Array) -> jnp.ndarray:
        return latent_init(key, self.cfg, self.size)

    def decode(self, z, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        del shift, contrast
        dt = self.compute_dtype
        if dt == "auto":
            import os
            on_tpu = jax.default_backend() in ("tpu", "axon")
            dt = (jnp.bfloat16 if on_tpu
                  and os.environ.get("APHANTASIA_DECODE_F32") != "1"
                  else jnp.float32)
        return vqgan_decode(self.decoder_params, self.cfg, z, dtype=dt)

    def image(self, z, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        return self.decode(z)


def convert_taming(path_or_sd, cfg: VQGANConfig):
    """taming-transformers checkpoint (state_dict with 'decoder.*',
    'post_quant_conv.*') -> decoder param pytree."""
    if isinstance(path_or_sd, str):
        try:
            import torch
            sd = torch.load(path_or_sd, map_location="cpu")
            sd = sd.get("state_dict", sd)
            sd = {k: v.float().numpy() for k, v in sd.items()}
        except ImportError:
            from aphantasia_tpu.io.checkpoint import load_pt
            sd = load_pt(path_or_sd)
            sd = sd.get("state_dict", sd)
    else:
        sd = {k: np.asarray(v, np.float32) for k, v in path_or_sd.items()}

    def conv(prefix):
        return {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}

    def norm(prefix):
        return {"g": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
                "b": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}

    def res(prefix):
        p = {"norm1": norm(prefix + ".norm1"), "conv1": conv(prefix + ".conv1"),
             "norm2": norm(prefix + ".norm2"), "conv2": conv(prefix + ".conv2")}
        if prefix + ".nin_shortcut.weight" in sd:
            p["nin"] = conv(prefix + ".nin_shortcut")
        return p

    def attn(prefix):
        return {"norm": norm(prefix + ".norm"), "q": conv(prefix + ".q"),
                "k": conv(prefix + ".k"), "v": conv(prefix + ".v"),
                "proj": conv(prefix + ".proj_out")}

    ups = []
    for level in range(len(cfg.ch_mult)):
        lev = {"blocks": []}
        j = 0
        while f"decoder.up.{level}.block.{j}.norm1.weight" in sd:
            lev["blocks"].append(res(f"decoder.up.{level}.block.{j}"))
            j += 1
        attns = []
        j = 0
        while f"decoder.up.{level}.attn.{j}.norm.weight" in sd:
            attns.append(attn(f"decoder.up.{level}.attn.{j}"))
            j += 1
        if attns:
            lev["attns"] = attns
        if f"decoder.up.{level}.upsample.conv.weight" in sd:
            lev["upsample"] = conv(f"decoder.up.{level}.upsample.conv")
        ups.append(lev)

    out = {
        "conv_in": conv("decoder.conv_in"),
        "mid": {"block1": res("decoder.mid.block_1"),
                "attn": attn("decoder.mid.attn_1"),
                "block2": res("decoder.mid.block_2")},
        "up": ups,
        "norm_out": norm("decoder.norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }
    if "post_quant_conv.weight" in sd:  # kept for use_post_quant decodes
        out["post_quant"] = conv("post_quant_conv")
    return out
