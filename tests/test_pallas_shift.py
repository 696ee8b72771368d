"""Parity of the fused Pallas fractional-shift pass (interpret mode on CPU)
against the XLA reference path in ops/sep_warp.py — values and VJP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops import pallas_shift
from aphantasia_tpu.ops.sep_warp import _frac_shift_vjp


CASES = [
    # (lead, n_in, n_total, in_offset, out_window)
    ((3, 2, 16), 16, 24, 4, (0, 24)),     # L-pass shape: unpadded in, full out
    ((3, 2, 16), 24, 24, 0, (4, 16)),     # U-pass shape: padded in, cropped out
    ((5, 8), 12, 12, 0, (0, 12)),         # plain full-length shift
]


@pytest.mark.parametrize("lead,n_in,n,off,win", CASES)
def test_pallas_shift_matches_xla(lead, n_in, n, off, win, monkeypatch):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, lead + (n_in,))
    # per-row shift, broadcast over the second-to-last lead dim like the augs
    sh_shape = (lead[0],) + (1,) * (len(lead) - 2) + (lead[-1],)
    shift = 3.0 * jax.random.normal(jax.random.PRNGKey(1), sh_shape)

    want = _frac_shift_vjp(x, shift, -1, "float32", n, off, win)
    got = pallas_shift.pallas_frac_shift_last(x, shift, "float32", n, off,
                                              win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # VJP parity
    def loss_ref(x):
        return jnp.sum(jnp.sin(
            _frac_shift_vjp(x, shift, -1, "float32", n, off, win)))

    def loss_pl(x):
        return jnp.sum(jnp.sin(pallas_shift.pallas_frac_shift_last(
            x, shift, "float32", n, off, win)))

    g_ref = jax.grad(loss_ref)(x)
    g_pl = jax.grad(loss_pl)(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_dispatch_disabled_on_cpu():
    # CPU default backend -> the XLA path serves fractional_shift
    assert not pallas_shift.enabled()
