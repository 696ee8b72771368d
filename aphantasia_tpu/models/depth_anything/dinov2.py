"""DINOv2 ViT trunk for Depth-Anything-V2, pure functional JAX.

Architecture parity with the reference's vendored net (depth/any2/dinov2.py:
44-415): patch-14 embedding, class token, bicubically-interpolated position
embeddings, pre-norm blocks with LayerScale, returning selected intermediate
layers for the DPT head.  Attention uses jax.nn.dot_product_attention (the
MemEffAttention equivalent, depth/any2/dinov2_layers/attention.py:65-82).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from aphantasia_tpu.models.clip.model import layer_norm  # fp32 layernorm


def _mlp(x, p):
    x = x @ p["fc1_w"].astype(x.dtype) + p["fc1_b"].astype(x.dtype)
    x = jax.nn.gelu(x, approximate=False)
    return x @ p["fc2_w"].astype(x.dtype) + p["fc2_b"].astype(x.dtype)


def _attn(x, p, n_heads):
    b, t, d = x.shape
    qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // n_heads
    q = q.reshape(b, t, n_heads, hd)
    k = k.reshape(b, t, n_heads, hd)
    v = v.reshape(b, t, n_heads, hd)
    o = jax.nn.dot_product_attention(q, k, v).reshape(b, t, d)
    return o @ p["proj_w"].astype(x.dtype) + p["proj_b"].astype(x.dtype)


def _block(x, p, n_heads):
    x = x + p["ls1"].astype(x.dtype) * _attn(layer_norm(x, p["ln_1"]), p["attn"], n_heads)
    x = x + p["ls2"].astype(x.dtype) * _mlp(layer_norm(x, p["ln_2"]), p["mlp"])
    return x


def interp_pos_emb(pos_emb, gh, gw):
    """Bicubic position-embedding interpolation (reference
    depth/any2/dinov2.py interpolate_pos_encoding; HF Dinov2 matches).

    Torch-exact: `F.interpolate(mode='bicubic', align_corners=False)` —
    cubic A=-0.75, half-pixel mapping, NO antialias (jax.image.resize
    would antialias the 37x37 -> small-grid DOWNSCALE with a different
    kernel; caught by the full-size synthetic parity test,
    tests/test_convert_full.py).  pos_emb: [1 + g0*g0, D], square g0."""
    cls = pos_emb[:1]
    patch = pos_emb[1:]
    g0 = int(round(patch.shape[0] ** 0.5))
    d = patch.shape[-1]
    if (gh, gw) == (g0, g0):
        return pos_emb
    from aphantasia_tpu.ops.resize import resize_bicubic_halfpix
    grid = patch.astype(jnp.float32).reshape(g0, g0, d).transpose(2, 0, 1)
    grid = resize_bicubic_halfpix(grid, (gh, gw))        # [D, gh, gw]
    grid = grid.transpose(1, 2, 0).reshape(gh * gw, d).astype(pos_emb.dtype)
    return jnp.concatenate([cls, grid], axis=0)


def dinov2_features(params, x, n_heads, take_layers, patch: int = 14,
                    dtype=jnp.float32):
    """x: [N,3,H,W] (imagenet-normalized, H/W multiples of 14).

    Returns list of [N, gh*gw, D] patch-token activations (class token
    stripped) for each index in `take_layers`."""
    n, c, h, w = x.shape
    gh, gw = h // patch, w // patch
    x = x.astype(dtype)
    x = x.reshape(n, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, gh * gw, c * patch * patch)
    x = x @ params["patch_w"].astype(dtype) + params["patch_b"].astype(dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (n, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pe = interp_pos_emb(params["pos_emb"], gh, gw).astype(dtype)
    x = x + pe
    outs = []
    for i, blk in enumerate(params["blocks"]):
        x = _block(x, blk, n_heads)
        if i in take_layers:
            outs.append(x)
    # final layernorm applied to EVERY tapped layer: the reference's
    # vendored net taps via get_intermediate_layers(norm=True) (its
    # default; depth/any2/dinov2.py:297-308, dpt.py:114) and HF
    # Dinov2Backbone ships apply_layernorm=true — omitting it was a real
    # fidelity bug caught by the full-size synthetic parity test
    # (tests/test_convert_full.py)
    fln = params.get("final_ln")
    if fln is not None:
        outs = [layer_norm(o, fln) for o in outs]
    return [o[:, 1:] for o in outs]  # strip class token


def dinov2_init(key, depth, dim, n_heads, patch: int = 14, img: int = 518):
    g0 = img // patch
    keys = iter(jax.random.split(key, depth * 6 + 4))
    def ln():
        return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    def blk():
        s = dim ** -0.5
        return {
            "ln_1": ln(),
            "attn": {"qkv_w": s * jax.random.normal(next(keys), (dim, 3 * dim)),
                     "qkv_b": jnp.zeros((3 * dim,)),
                     "proj_w": s * jax.random.normal(next(keys), (dim, dim)),
                     "proj_b": jnp.zeros((dim,))},
            "ls1": 1e-5 * jnp.ones((dim,)),
            "ln_2": ln(),
            "mlp": {"fc1_w": s * jax.random.normal(next(keys), (dim, 4 * dim)),
                    "fc1_b": jnp.zeros((4 * dim,)),
                    "fc2_w": s * jax.random.normal(next(keys), (4 * dim, dim)),
                    "fc2_b": jnp.zeros((dim,))},
            "ls2": 1e-5 * jnp.ones((dim,)),
        }
    return {
        "patch_w": 0.02 * jax.random.normal(next(keys), (3 * patch * patch, dim)),
        "patch_b": jnp.zeros((dim,)),
        "cls_token": 0.02 * jax.random.normal(next(keys), (dim,)),
        "pos_emb": 0.02 * jax.random.normal(next(keys), (1 + g0 * g0, dim)),
        "blocks": [blk() for _ in range(depth)],
        "final_ln": ln(),
    }
