"""VQGAN decoder tests: shapes, gradient flow, taming-checkpoint converter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.models.vqgan import (
    VQGANConfig, VQGAN_CONFIGS, vqgan_init, vqgan_decode, latent_init,
    VQGANParameterizer, convert_taming)

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)

TINY = VQGANConfig("tiny", z_channels=8, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=())


def test_decode_shape_and_range():
    params = vqgan_init(jax.random.PRNGKey(0), TINY)
    z = latent_init(jax.random.PRNGKey(1), TINY, (16, 24))
    assert z.shape == (1, 8, 8, 12)
    img = vqgan_decode(params, TINY, z)
    assert img.shape == (1, 3, 16, 24)
    assert float(img.min()) >= 0 and float(img.max()) <= 1


def test_f16_config_factor():
    assert VQGAN_CONFIGS["imagenet_f16_1024"].f == 16
    assert VQGAN_CONFIGS["gumbel_f8_8192"].f == 8


def test_gradient_flows_to_latents():
    params = vqgan_init(jax.random.PRNGKey(0), TINY)
    par = VQGANParameterizer((16, 16), TINY, params)
    z = par.init(jax.random.PRNGKey(2))

    def loss(zz):
        return jnp.sum(par.image(zz) ** 2)

    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_convert_taming_tiny():
    """Build a tiny torch decoder state_dict by name and convert."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)

    sd = {}

    def conv(prefix, cin, cout, k):
        sd[prefix + ".weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[prefix + ".bias"] = np.zeros(cout, np.float32)

    def norm(prefix, c):
        sd[prefix + ".weight"] = np.ones(c, np.float32)
        sd[prefix + ".bias"] = np.zeros(c, np.float32)

    def res(prefix, cin, cout):
        norm(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout, 3)
        norm(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout, 3)
        if cin != cout:
            conv(prefix + ".nin_shortcut", cin, cout, 1)

    def attn(prefix, c):
        norm(prefix + ".norm", c)
        for nm in ("q", "k", "v"):
            conv(prefix + "." + nm, c, c, 1)
        conv(prefix + ".proj_out", c, c, 1)

    block_in = 8 * 2
    conv("post_quant_conv", 8, 8, 1)
    conv("decoder.conv_in", 8, block_in, 3)
    res("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in)
    # level 1 (coarsest, ch_mult=2): blocks + upsample; level 0: blocks
    res("decoder.up.1.block.0", block_in, 16)
    res("decoder.up.1.block.1", 16, 16)
    conv("decoder.up.1.upsample.conv", 16, 16, 3)
    res("decoder.up.0.block.0", 16, 8)
    res("decoder.up.0.block.1", 8, 8)
    norm("decoder.norm_out", 8)
    conv("decoder.conv_out", 8, 3, 3)

    params = convert_taming(sd, TINY)
    z = latent_init(jax.random.PRNGKey(3), TINY, (16, 16))
    img = vqgan_decode(params, TINY, z)
    assert img.shape == (1, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()
