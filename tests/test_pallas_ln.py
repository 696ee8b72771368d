"""Fused LayerNorm kernel parity (ops/pallas_ln.py, r4)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.pallas_ln import layer_norm_fused, eligible, _BR

pytestmark = pytest.mark.slow


def _ref_ln(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


@pytest.mark.parametrize("r", [2 * _BR, 2 * _BR + 177])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_ln_fused_matches_reference(r, dt):
    d = 256
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = (jax.random.normal(k1, (r, d)) * 2 + 0.5).astype(dt)
    g = jax.random.normal(k2, (d,)) * 0.5 + 1.0
    b = jax.random.normal(k3, (d,)) * 0.1
    assert eligible(x, g)
    got = jax.jit(lambda x: layer_norm_fused(x, g, b))(x)
    ref = _ref_ln(x, g, b)
    atol = 1e-5 if dt == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol)

    # full VJP parity: dx AND dg/db (the kernel accumulates them across
    # row blocks — correct even though the CLIP towers never use them)
    co = jax.random.normal(k4, (r, d)).astype(dt)
    f_got = lambda x, g, b: jnp.sum(
        layer_norm_fused(x, g, b).astype(jnp.float32) * co)
    f_ref = lambda x, g, b: jnp.sum(_ref_ln(x, g, b).astype(jnp.float32) * co)
    gx1, gg1, gb1 = jax.jit(jax.grad(f_got, argnums=(0, 1, 2)))(x, g, b)
    gx2, gg2, gb2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, g, b)
    tol = dict(atol=(1e-4 if dt == jnp.float32 else 5e-2), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gx1, np.float32),
                               np.asarray(gx2, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(gg1, np.float32),
                               np.asarray(gg2, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(gb1, np.float32),
                               np.asarray(gb2, np.float32), **tol)


def test_ln_gate_only_2d_lane_multiple():
    g = jnp.ones((768,))
    assert not eligible(jnp.zeros((4, 50, 768)), g)      # 3D
    assert not eligible(jnp.zeros((8, 768)), g)          # too few rows
    assert not eligible(jnp.zeros((4096, 770)), jnp.ones((770,)))
