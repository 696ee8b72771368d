"""LPIPS golden: tiny-random torch mirror of the VGG16+lin pipeline.

Binds `models/lpips.py` numerically to the pip `lpips.LPIPS(net='vgg')`
semantics (reference clip_fft.py:220-222): VGG16 relu1_2/2_2/3_3/4_3/5_3
taps, channel-unit-norm, squared diffs through non-negative 1x1 lin heads,
spatial average, sum.  The torch mirror below implements exactly the pip
package's math with shared random weights, so any deviation in conv
padding, pool semantics, tap placement, scaling constants, or reduction
order fails the <=1e-4 assertion.  (Same pattern as tests/test_clip.py.)
"""
import numpy as np
import pytest

import jax.numpy as jnp

from aphantasia_tpu.models.lpips import (VGG_CFG, TAP_CHANNELS, lpips_load,
                                         lpips_apply, _SHIFT, _SCALE)

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)


def _random_states(seed=0):
    """Random weights in the exact naming lpips_load consumes."""
    rs = np.random.RandomState(seed)
    vgg, idx = {}, 0
    cin = 3
    for v in VGG_CFG:
        if v == "M":
            idx += 1
            continue
        fan = 3 * 3 * cin
        vgg[f"features.{idx}.weight"] = (
            rs.randn(v, cin, 3, 3) * np.sqrt(2.0 / fan)).astype(np.float32)
        vgg[f"features.{idx}.bias"] = rs.randn(v).astype(np.float32) * 0.01
        cin = v
        idx += 2  # conv + relu
    lin = {}
    for i, c in enumerate(TAP_CHANNELS):
        lin[f"lin{i}.model.1.weight"] = (
            np.abs(rs.randn(1, c, 1, 1)).astype(np.float32) / c)
    return vgg, lin


def _torch_lpips(vgg_sd, lin_sd, x_np, y_np):
    """The pip lpips forward (normalize=True), written out in torch."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(z):
        taps, idx, ci = [], 0, 0
        for v in VGG_CFG:
            if v == "M":
                z = F.max_pool2d(z, 2)
                idx += 1
                continue
            w = torch.from_numpy(vgg_sd[f"features.{idx}.weight"])
            b = torch.from_numpy(vgg_sd[f"features.{idx}.bias"])
            z = F.relu(F.conv2d(z, w, b, padding=1))
            if ci in (1, 3, 6, 9, 12):   # relu1_2/2_2/3_3/4_3/5_3
                taps.append(z)
            ci += 1
            idx += 2
        return taps

    def unit(z):  # lpips.normalize_tensor
        return z / (z.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    x = (2.0 * torch.from_numpy(x_np) - 1.0 - shift) / scale
    y = (2.0 * torch.from_numpy(y_np) - 1.0 - shift) / scale
    total = 0.0
    for tx, ty, i in zip(feats(x), feats(y), range(len(TAP_CHANNELS))):
        d = (unit(tx) - unit(ty)) ** 2
        w = torch.from_numpy(lin_sd[f"lin{i}.model.1.weight"])
        total = total + F.conv2d(d, w).mean(dim=(2, 3))
    return total[:, 0].numpy()


def test_lpips_matches_torch_mirror():
    pytest.importorskip("torch")
    vgg_sd, lin_sd = _random_states()
    rs = np.random.RandomState(7)
    x = rs.rand(2, 3, 64, 64).astype(np.float32)
    y = rs.rand(2, 3, 64, 64).astype(np.float32)

    params = lpips_load(vgg_sd, lin_sd)
    got = np.asarray(lpips_apply(params, jnp.asarray(x), jnp.asarray(y)))
    want = _torch_lpips(vgg_sd, lin_sd, x, y)
    assert got.shape == want.shape == (2,)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_lpips_zero_for_identical_inputs():
    vgg_sd, lin_sd = _random_states()
    params = lpips_load(vgg_sd, lin_sd)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 3, 64, 64), jnp.float32)
    d = float(lpips_apply(params, x, x)[0])
    assert abs(d) < 1e-6
