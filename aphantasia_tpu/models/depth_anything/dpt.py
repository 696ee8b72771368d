"""DPT depth head + full Depth-Anything-V2 model.

Architecture parity with the reference's vendored net (depth/any2/dpt.py:
25-139: DPTHead multi-scale reassembly + FeatureFusion refinement;
per-encoder intermediate layer indices at dpt.py:102-107) and the inference
wrapper depth/depth.py:20-31 (imagenet normalize -> model -> min-max
normalize).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from aphantasia_tpu.models.depth_anything.dinov2 import (
    dinov2_features, dinov2_init)


@dataclasses.dataclass(frozen=True)
class DAV2Config:
    name: str
    dim: int
    depth: int
    n_heads: int
    take_layers: tuple
    out_channels: tuple
    features: int


DAV2_CONFIGS = {
    "s": DAV2Config("s", 384, 12, 6, (2, 5, 8, 11), (48, 96, 192, 384), 64),
    "b": DAV2Config("b", 768, 12, 12, (2, 5, 8, 11), (96, 192, 384, 768), 128),
    "l": DAV2Config("l", 1024, 24, 16, (4, 11, 17, 23), (256, 512, 1024, 1024), 256),
}


def _conv(x, w, b=None, stride=1, padding="SAME"):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _conv_transpose(x, w, b=None, stride=2):
    """torch `ConvTranspose2d(..., stride, padding=0)` EXACT: lhs-dilated
    conv with the spatially-flipped kernel and (k-1) edge padding.
    `lax.conv_transpose(..., 'SAME')` does NOT flip the kernel and pads
    differently — it never matched torch (third real DA-V2 parity bug
    caught by the full-size synthetic test, tests/test_convert_full.py;
    the tiny HF golden's random fusion weights were numerically blind to
    the upsample levels).  w: HWIO [kh,kw,in,out]."""
    k = w.shape[0]
    out = lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)).astype(x.dtype), (1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _resize_align(x, oh, ow):
    """NHWC bilinear resize with align_corners=True — torch-exact for the
    DPT fusion/head interpolates (reference depth/any2/util/blocks.py
    scale_factor=2 align_corners=True; HF resizes to the next level's
    size).  jax.image.resize's half-pixel bilinear drifted every fusion
    level (~0.97 corr/level, compounding — caught by the full-size
    synthetic parity test, tests/test_convert_full.py)."""
    from aphantasia_tpu.ops.resize import linear_axis_matrix
    n, h, w, c = x.shape
    wy = linear_axis_matrix(oh, h).astype(x.dtype)
    wx = linear_axis_matrix(ow, w).astype(x.dtype)
    x = jnp.einsum("Oh,nhwc->nOwc", wy, x)
    return jnp.einsum("Pw,nOwc->nOPc", wx, x)


def _rcu(x, p):
    """ResidualConvUnit (depth/any2/util/blocks.py)."""
    out = jax.nn.relu(x)
    out = _conv(out, p["conv1_w"], p["conv1_b"])
    out = jax.nn.relu(out)
    out = _conv(out, p["conv2_w"], p["conv2_b"])
    return x + out


def _fusion(x, skip, p, size):
    """FeatureFusionBlock: refine skip, add, refine, upsample to `size`
    (the next level's dims; 2x at the last block) with align_corners=True
    bilinear, project."""
    if skip is not None:
        x = x + _rcu(skip, p["rcu1"])
    x = _rcu(x, p["rcu2"])
    x = _resize_align(x, *size)
    return _conv(x, p["out_w"], p["out_b"])


def dav2_apply(params, cfg: DAV2Config, x, dtype=jnp.float32):
    """x: [N,3,H,W] imagenet-normalized, H/W multiples of 14.
    Returns raw depth [N,1,H,W] (pre min-max normalization)."""
    n, _, h, w = x.shape
    gh, gw = h // 14, w // 14
    feats = dinov2_features(params["backbone"], x, cfg.n_heads,
                            set(cfg.take_layers), dtype=dtype)
    hp = params["head"]
    pyramid = []
    for i, f in enumerate(feats):
        f = f @ hp["proj_w"][i].astype(f.dtype) + hp["proj_b"][i].astype(f.dtype)
        f = f.reshape(n, gh, gw, -1)
        if i == 0:
            f = _conv_transpose(f, hp["up4_w"], hp["up4_b"], stride=4)
        elif i == 1:
            f = _conv_transpose(f, hp["up2_w"], hp["up2_b"])
        elif i == 3:
            # explicit (1,1) padding: at stride 2 XLA's SAME pads (0,1)
            # while the HF reassemble down layer (Conv2d padding=1) pads
            # (1,1) — a one-pixel window shift on even grids (same bug
            # class as the CLIP ResNet stem; see tests/test_depth.py)
            f = _conv(f, hp["down_w"], hp["down_b"], stride=2,
                      padding=((1, 1), (1, 1)))
        pyramid.append(f)

    # scratch: project each level to `features` channels
    scratch = [_conv(f, hp["scratch_w"][i]) for i, f in enumerate(pyramid)]

    # fusion top-down (coarsest first); each block upsamples to the next
    # level's size (HF passes size=next level; the vendored net's 2x +
    # caller crop is equivalent on these exact-power grids)
    path = _fusion(scratch[3], None, hp["fusion"][3],
                   scratch[2].shape[1:3])
    path = _fusion(path, scratch[2], hp["fusion"][2], scratch[1].shape[1:3])
    path = _fusion(path, scratch[1], hp["fusion"][1], scratch[0].shape[1:3])
    path = _fusion(path, scratch[0], hp["fusion"][0],
                   (2 * scratch[0].shape[1], 2 * scratch[0].shape[2]))

    out = _conv(path, hp["out1_w"], hp["out1_b"])
    out = _resize_align(out, h, w)
    out = jax.nn.relu(_conv(out, hp["out2_w"], hp["out2_b"]))
    out = jax.nn.relu(_conv(out, hp["out3_w"], hp["out3_b"]))
    return out.transpose(0, 3, 1, 2)[:, :1]


def _conv_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout)) * np.sqrt(2.0 / fan)


@functools.partial(jax.jit, static_argnums=(1,))
def dav2_init(key, cfg: DAV2Config):
    # jitted: one dispatch + persistently-cached compile instead of ~30s of
    # per-weight RNG dispatches at CLI startup (see clip_init)
    kb, kh = jax.random.split(key)
    backbone = dinov2_init(kb, cfg.depth, cfg.dim, cfg.n_heads)
    keys = iter(jax.random.split(kh, 64))
    f = cfg.features
    oc = cfg.out_channels
    head = {
        "proj_w": [cfg.dim ** -0.5 * jax.random.normal(next(keys), (cfg.dim, oc[i]))
                   for i in range(4)],
        "proj_b": [jnp.zeros((oc[i],)) for i in range(4)],
        "up4_w": _conv_init(next(keys), 4, 4, oc[0], oc[0]),
        "up4_b": jnp.zeros((oc[0],)),
        "up2_w": _conv_init(next(keys), 2, 2, oc[1], oc[1]),
        "up2_b": jnp.zeros((oc[1],)),
        "down_w": _conv_init(next(keys), 3, 3, oc[3], oc[3]),
        "down_b": jnp.zeros((oc[3],)),
        "scratch_w": [_conv_init(next(keys), 3, 3, oc[i], f) for i in range(4)],
        "fusion": [{
            "rcu1": {"conv1_w": _conv_init(next(keys), 3, 3, f, f),
                     "conv1_b": jnp.zeros((f,)),
                     "conv2_w": _conv_init(next(keys), 3, 3, f, f),
                     "conv2_b": jnp.zeros((f,))},
            "rcu2": {"conv1_w": _conv_init(next(keys), 3, 3, f, f),
                     "conv1_b": jnp.zeros((f,)),
                     "conv2_w": _conv_init(next(keys), 3, 3, f, f),
                     "conv2_b": jnp.zeros((f,))},
            "out_w": _conv_init(next(keys), 1, 1, f, f),
            "out_b": jnp.zeros((f,)),
        } for _ in range(4)],
        "out1_w": _conv_init(next(keys), 3, 3, f, f // 2),
        "out1_b": jnp.zeros((f // 2,)),
        "out2_w": _conv_init(next(keys), 3, 3, f // 2, 32),
        "out2_b": jnp.zeros((32,)),
        "out3_w": _conv_init(next(keys), 1, 1, 32, 1),
        "out3_b": jnp.zeros((1,)),
    }
    return {"backbone": backbone, "head": head}


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class InferDepthAny:
    """Parity with depth/depth.py:20-31: imagenet-normalize -> model ->
    min-max normalize.  modtype 'l'/'b'/'s'; random weights unless a
    converter-provided param pytree is passed."""

    def __init__(self, modtype: str = "b", params=None, key=None,
                 dtype=jnp.float32):
        m = modtype[0].lower()
        self.cfg = DAV2_CONFIGS.get(m, DAV2_CONFIGS["b"])
        if params is None:
            from aphantasia_tpu.weights import env_weights, warn_random
            path = env_weights("dav2")
            if path:
                from aphantasia_tpu.models.depth_anything.convert import (
                    convert_hf_dav2)
                params = convert_hf_dav2(path)
            else:
                warn_random("dav2 Depth-Anything-V2")
                if key is None:
                    key = jax.random.PRNGKey(0)
                params = dav2_init(key, self.cfg)
        self.params = params
        self.dtype = dtype
        self._jitted = jax.jit(lambda p, x: InferDepthAny.apply(
            p, self.cfg, x, dtype=self.dtype))

    @staticmethod
    def apply(params, cfg, image, dtype=jnp.float32):
        """Pure inference: imagenet-normalize -> model -> per-sample
        min-max (reference depth.py:27-31; per-sample keeps the numerics
        exact when callers batch the mirror pair into one forward).
        `params` is an explicit argument so callers can jit this without
        the ~100M-parameter tree being inlined into the program (the
        tunneled compile service rejects oversized modules)."""
        mean = jnp.asarray(_IMAGENET_MEAN)[None, :, None, None]
        std = jnp.asarray(_IMAGENET_STD)[None, :, None, None]
        x = (image - mean) / std
        depth = dav2_apply(params, cfg, x, dtype=dtype)
        dmin = depth.min(axis=(-3, -2, -1), keepdims=True)
        dmax = depth.max(axis=(-3, -2, -1), keepdims=True)
        return (depth - dmin) / (dmax - dmin + 1e-12)

    def __call__(self, image):
        """image: [N,3,H,W] in [0,1], H/W multiples of 14 -> [1,1,H,W] in [0,1]."""
        return self._jitted(self.params, image)
