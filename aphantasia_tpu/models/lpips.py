"""LPIPS perceptual distance (VGG16 backbone) in pure JAX.

Equivalent of the pip `lpips.LPIPS(net='vgg')` loss the reference uses for
`--sync` image composition (clip_fft.py:220-222,268-270): VGG16 relu1_2/2_2/
3_3/4_3/5_3 features, channel-unit-normalized, squared diffs through learned
non-negative 1x1 "lin" heads, spatially averaged and summed.

Weights convert from the lpips package checkpoints when available
(`lpips_load`); the random-init fallback keeps the term differentiable and
shape-correct in hermetic environments (documented deviation: calibration
then reflects an uncalibrated perceptual metric).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
# features after the last ReLU of each block (torchvision indices 3,8,15,22,29)
TAP_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


@jax.jit
def lpips_init(key: jax.Array):
    # jitted: one dispatch instead of per-weight RNG dispatches at CLI
    # startup (see clip/model.py clip_init)
    convs = []
    cin = 3
    keys = iter(jax.random.split(key, len(VGG_CFG) + len(TAP_CHANNELS)))
    for v in VGG_CFG:
        if v == "M":
            continue
        fan = 3 * 3 * cin
        convs.append({
            "w": jax.random.normal(next(keys), (3, 3, cin, v)) * np.sqrt(2.0 / fan),
            "b": jnp.zeros((v,)),
        })
        cin = v
    lins = [jnp.abs(jax.random.normal(next(keys), (c, 1))) / c
            for c in TAP_CHANNELS]
    return {"convs": convs, "lins": lins}


def lpips_get(key, path: str | None = None):
    """LPIPS params with the standard resolution order: explicit path ->
    APHANTASIA_LPIPS_PT env -> LOUD random fallback.

    `path` points to a single .pt/.npz holding BOTH the torchvision VGG16
    `features.*` tensors and the lpips `lin*.model.1.weight` heads."""
    from aphantasia_tpu.weights import env_weights, warn_random

    path = env_weights("lpips", path)
    if path:
        if path.endswith(".npz"):
            sd = dict(np.load(path))
        else:
            try:
                import torch
                sd = {k: v.float().numpy()
                      for k, v in torch.load(path, map_location="cpu").items()}
            except ImportError:
                from aphantasia_tpu.io.checkpoint import load_pt
                sd = load_pt(path)
        vgg = {k: v for k, v in sd.items() if k.startswith("features.")}
        lin = {k: v for k, v in sd.items() if k.startswith("lin")}
        return lpips_load(vgg, lin)
    warn_random("lpips VGG16+linear heads")
    return lpips_init(key)


def lpips_load(vgg_state, lin_state):
    """Convert torchvision VGG16 `features` weights + lpips lin weights.

    vgg_state: {'features.0.weight': ...} torch arrays (or numpy)
    lin_state: {'lin0.model.1.weight': [1,C,1,1], ...}
    """
    def n(x):
        return np.asarray(getattr(x, "numpy", lambda: x)(), np.float32)
    convs = []
    idx = 0
    for v in VGG_CFG:
        if v == "M":
            idx += 1
            continue
        w = n(vgg_state[f"features.{idx}.weight"])   # OIHW
        b = n(vgg_state[f"features.{idx}.bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
        idx += 2  # conv + relu
    lins = []
    for i in range(len(TAP_CHANNELS)):
        w = n(lin_state[f"lin{i}.model.1.weight"])   # [1,C,1,1]
        lins.append(jnp.asarray(w[0, :, 0, 0][:, None]))
    return {"convs": convs, "lins": lins}


def _vgg_features(params, x):
    """x: NHWC in VGG input space. Returns the 5 tap activations."""
    taps = []
    ci = 0
    block_last = {1, 3, 6, 9, 12}  # conv index whose relu is a tap
    for v in VGG_CFG:
        if v == "M":
            x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                       (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        p = params["convs"][ci]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(x.dtype)
        x = jax.nn.relu(x)
        if ci in block_last:
            taps.append(x)
        ci += 1
    return taps


def _unit_norm(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + eps)


def lpips_apply(params, x, y, normalize: bool = True):
    """Perceptual distance between NCHW images. normalize=True expects [0,1]
    inputs (matches `lpips.LPIPS.forward(..., normalize=True)`)."""
    if normalize:
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    x = ((x - shift) / scale).transpose(0, 2, 3, 1)
    y = ((y - shift) / scale).transpose(0, 2, 3, 1)
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for tx, ty, lin in zip(fx, fy, params["lins"]):
        d = (_unit_norm(tx) - _unit_norm(ty)) ** 2
        d = d.mean(axis=(1, 2))                    # spatial average
        total = total + (d @ jnp.abs(lin))[..., 0]
    return total
