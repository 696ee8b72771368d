"""Fused attention-core kernel parity (interpret mode on CPU).

The kernel (ops/pallas_attn.py) merges the sample block into matmul rows
with -inf bias on cross-sample blocks and padded keys; these tests pin its
forward and VJP against the plain einsum attention it replaces.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aphantasia_tpu.ops.pallas_attn import attention_core


def ref_attention(qkv, n_heads, causal=False):
    b, t, d3 = qkv.shape
    d = d3 // 3
    hd = d // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, n_heads, hd)
    k = k.reshape(b, t, n_heads, hd)
    v = v.reshape(b, t, n_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(b, t, d)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("b,t,h,hd", [(3, 10, 2, 8), (5, 16, 4, 16)])
def test_attention_core_fwd(b, t, h, hd, causal):
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, t, 3 * d))
    out = attention_core(qkv, h, causal)
    ref = ref_attention(qkv, h, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_core_grad():
    b, t, h, hd = 3, 10, 2, 8
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, t, 3 * d))
    co = jax.random.normal(jax.random.PRNGKey(2), (b, t, d))

    g_k = jax.grad(lambda q: jnp.sum(attention_core(q, h) * co))(qkv)
    g_r = jax.grad(lambda q: jnp.sum(ref_attention(q, h) * co))(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=2e-5, rtol=2e-4)


def test_attention_core_valid_t_prepadded():
    """Pre-padded rows (tower-level pad) must not affect real rows."""
    b, t, h, hd = 2, 8, 2, 8
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, 16, 3 * d))
    out = attention_core(qkv, h, False, t)          # valid_t = 8, T = 16
    ref = ref_attention(qkv[:, :t], h)
    np.testing.assert_allclose(np.asarray(out[:, :t]), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # and garbage in the pad rows must not leak gradients into real rows
    g = jax.grad(lambda q: jnp.sum(attention_core(q, h, False, t)[:, :t]))(qkv)
    g_ref = jax.grad(lambda q: jnp.sum(ref_attention(q[:, :t], h)))(qkv)
    np.testing.assert_allclose(np.asarray(g[:, :t]), np.asarray(g_ref[:, :t]),
                               atol=2e-5, rtol=2e-4)


def test_flat_geometry():
    from aphantasia_tpu.ops.pallas_attn import flat_geometry
    assert flat_geometry(50, jnp.bfloat16) == 8      # 400 rows, tile-aligned
    assert flat_geometry(64, jnp.bfloat16) == 4      # already aligned -> 256
    assert flat_geometry(257, jnp.bfloat16) is None  # 4112-row blocks: no
    bb = flat_geometry(50, jnp.float32)
    assert (bb * 50) % 8 == 0 and bb * 50 >= 256


@pytest.mark.parametrize("b,t,h,hd", [(3, 10, 2, 8), (9, 50, 4, 16)])
def test_attention_core_flat_fwd(b, t, h, hd):
    """Flat [b*t, 3d] stream == per-sample reference attention."""
    from aphantasia_tpu.ops.pallas_attn import attention_core_flat
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(4), (b, t, 3 * d))
    out = attention_core_flat(qkv.reshape(b * t, 3 * d), h, t)
    ref = ref_attention(qkv, h)
    np.testing.assert_allclose(np.asarray(out.reshape(b, t, d)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_attention_core_flat_grad():
    from aphantasia_tpu.ops.pallas_attn import attention_core_flat
    b, t, h, hd = 5, 10, 2, 8
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(5), (b, t, 3 * d))
    co = jax.random.normal(jax.random.PRNGKey(6), (b, t, d))

    g_k = jax.grad(lambda q: jnp.sum(
        attention_core_flat(q.reshape(b * t, 3 * d), h, t).reshape(b, t, d)
        * co))(qkv)
    g_r = jax.grad(lambda q: jnp.sum(ref_attention(q, h) * co))(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_fused_tower_matches_xla_tower():
    """encode_image with FUSED_ATTN forced through interpret mode == XLA."""
    import aphantasia_tpu.models.clip.model as M
    import aphantasia_tpu.ops.pallas_attn as PA

    cfg = M.CLIP_CONFIGS["ViT-B/32"]
    cfg = type(cfg)(**{**cfg.__dict__, "vision_layers": 2,
                       "transformer_layers": 2})
    params = M.clip_init(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 224, 224))

    a = M.encode_image(params, cfg, imgs)
    orig_active, orig_interp = M._fused_attn_active, PA._interpret
    M._fused_attn_active = lambda: True
    PA._interpret = lambda: True
    try:
        b = M.encode_image(params, cfg, imgs)
    finally:
        M._fused_attn_active = orig_active
        PA._interpret = orig_interp
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-5, rtol=5e-4)


def test_attention_core_flat_score_bf16(monkeypatch):
    """APHANTASIA_ATTN_SCORE_BF16=1 keeps the [n,n] score/prob intermediates
    in bf16 (opt-in bytes-bound experiment, docs/TPU_MEASUREMENTS_r3.md §6).
    Probabilities lose ~0.4% relative precision; fwd+VJP must stay within
    that envelope of the f32-score kernel on bf16 inputs."""
    from aphantasia_tpu.ops.pallas_attn import attention_core_flat
    b, t, h, hd = 4, 12, 2, 8
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(7), (b, t, 3 * d), jnp.bfloat16)
    co = jax.random.normal(jax.random.PRNGKey(8), (b, t, d), jnp.bfloat16)

    def run(q):
        flat = attention_core_flat(q.reshape(b * t, 3 * d), h, t)
        return flat.reshape(b, t, d)

    monkeypatch.delenv("APHANTASIA_ATTN_SCORE_BF16", raising=False)
    out32 = np.asarray(run(qkv), np.float32)
    g32 = np.asarray(jax.grad(
        lambda q: jnp.sum(run(q).astype(jnp.float32) * co))(qkv), np.float32)
    monkeypatch.setenv("APHANTASIA_ATTN_SCORE_BF16", "1")
    out16 = np.asarray(run(qkv), np.float32)
    g16 = np.asarray(jax.grad(
        lambda q: jnp.sum(run(q).astype(jnp.float32) * co))(qkv), np.float32)

    np.testing.assert_allclose(out16, out32, atol=3e-2, rtol=3e-2)
    scale = np.abs(g32).max()
    np.testing.assert_allclose(g16 / scale, g32 / scale, atol=5e-2)
