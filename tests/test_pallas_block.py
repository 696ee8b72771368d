"""Fused residual-block halves (ops/pallas_block.py) vs the unfused
resblock_flat — value and dx-gradient parity (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.models.clip.model import resblock_flat, _block_init
from aphantasia_tpu.ops.pallas_block import resblock_flat_fused, attn_half, mlp_half

pytestmark = pytest.mark.slow  # interpret-mode kernels are slow on CPU

T, BB, D, NH = 10, 4, 32, 2     # block = 40 rows, f32 tile-aligned


@pytest.fixture(scope="module")
def setup():
    p = _block_init(jax.random.PRNGKey(0), D)
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (3 * T, D))
    return p, x


def test_fused_block_value_matches_unfused(setup):
    p, x = setup
    want = resblock_flat(x, p, NH, T)
    got = resblock_flat_fused(x, p, NH, T, BB)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_grad_matches_unfused(setup):
    p, x = setup
    co = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    g_want = jax.grad(lambda v: jnp.sum(resblock_flat(v, p, NH, T) * co))(x)
    g_got = jax.grad(
        lambda v: jnp.sum(resblock_flat_fused(v, p, NH, T, BB) * co))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=2e-4, atol=2e-5)


def test_fused_halves_pad_ragged_rows(setup):
    """Rows not a multiple of the block: pad rows are sliced away and get
    no gradient leakage."""
    p, x = setup
    x2 = x[:2 * T + T]     # 3 samples of T rows = 30, block is 40
    a = p["attn"]
    m = p["mlp"]
    y = attn_half(x2, p["ln_1"]["g"], p["ln_1"]["b"], a["in_w"], a["in_b"],
                  a["out_w"], a["out_b"], NH, T, BB)
    assert y.shape == x2.shape
    y2 = mlp_half(x2, p["ln_2"]["g"], p["ln_2"]["b"], m["fc_w"], m["fc_b"],
                  m["proj_w"], m["proj_b"], BB * T)
    assert y2.shape == x2.shape

    co = jax.random.normal(jax.random.PRNGKey(3), x2.shape)
    g = jax.grad(lambda v: jnp.sum(resblock_flat_fused(v, p, NH, T, BB)
                                   * co))(x2)
    g_ref = jax.grad(lambda v: jnp.sum(resblock_flat(v, p, NH, T) * co))(x2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_tower_env_gate(setup, monkeypatch):
    """APHANTASIA_FUSED_BLOCK=1 routes transformer_flat through the fused
    kernels with unchanged numerics."""
    from aphantasia_tpu.models.clip.model import transformer_flat
    p, x = setup
    blocks = [p, _block_init(jax.random.PRNGKey(9), D)]
    want = np.asarray(transformer_flat(x, blocks, NH, T))
    monkeypatch.setenv("APHANTASIA_FUSED_BLOCK", "1")
    got = np.asarray(transformer_flat(x, blocks, NH, T))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
