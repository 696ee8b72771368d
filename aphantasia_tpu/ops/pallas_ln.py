"""Fused LayerNorm — Pallas TPU kernel for the flat residual stream.

The r4 step profile (docs/TPU_MEASUREMENTS_r4.md §7) attributes
3.83 ms/step to the tower's 24 fwd+bwd LayerNorms: XLA's lowering
upcasts the bf16 [10000, 768] activations to f32 and MATERIALIZES the
converted intermediate around each reduction (~90 MB of HBM traffic per
LN vs the ~45 MB a register-resident f32 computation needs).  This
kernel keeps the f32 math in VMEM per row-block:

  fwd: y = (x - mu) * rsqrt(var + eps) * g + b, saving (mu, rstd) [R,2]
  bwd: dx = rstd * (h - mean(h) - xhat * mean(h * xhat)), h = g * dy,
       with dg = sum(dy * xhat) and db = sum(dy) accumulated across the
       row-block grid into constant [1, D] output blocks — the VJP is
       COMPLETE (correct dg/db), so this is a drop-in layer_norm even
       though the CLIP towers are frozen.

Gated to 2D [R, D] activations with D a lane multiple; everything else
keeps the XLA path (models/clip/model.py:layer_norm).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BR = 512      # rows per grid step


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, stat_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(x * x, -1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x - mu) * rstd * g_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32))
    y_ref[...] = y.astype(y_ref.dtype)
    stat_ref[:, 0:1] = mu
    stat_ref[:, 1:2] = rstd


def _bwd_kernel(x_ref, g_ref, stat_ref, do_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)
    mu = stat_ref[:, 0:1]
    rstd = stat_ref[:, 1:2]
    xhat = (x - mu) * rstd
    dy = do_ref[...].astype(jnp.float32)
    h = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(h, -1, keepdims=True)
    m2 = jnp.mean(h * xhat, -1, keepdims=True)
    dx_ref[...] = ((h - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)
    dg_ref[...] += jnp.sum(dy * xhat, 0, keepdims=True)
    db_ref[...] += jnp.sum(dy, 0, keepdims=True)


def _pad_rows(x, br):
    r = x.shape[0]
    pad = (-r) % br
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fused(x, g, b, eps=1e-5):
    """LayerNorm over the last axis of x [R, D]; full custom VJP."""
    y, _ = _ln_fwd(x, g, b, eps)
    return y


def _ln_fwd(x, g, b, eps):
    r, d = x.shape
    xp = _pad_rows(x, _BR)
    rp = xp.shape[0]
    y, stat = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(rp // _BR,),
        in_specs=[
            pl.BlockSpec((_BR, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((_BR, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_BR, 2), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rp, d), x.dtype),
                   jax.ShapeDtypeStruct((rp, 2), jnp.float32)),
        interpret=_interpret(),
    )(xp, g.reshape(1, d), b.reshape(1, d))
    return y[:r], (x, g, stat)


def _ln_bwd(eps, res, do):
    x, g, stat = res
    r, d = x.shape
    xp = _pad_rows(x, _BR)
    dop = _pad_rows(do.astype(x.dtype), _BR)
    rp = xp.shape[0]
    dx, dg, db = pl.pallas_call(
        _bwd_kernel,
        grid=(rp // _BR,),
        in_specs=[
            pl.BlockSpec((_BR, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((_BR, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rp, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=_interpret(),
    )(xp, g.reshape(1, d), stat, dop)
    return (dx[:r], dg.reshape(d).astype(g.dtype),
            db.reshape(d).astype(g.dtype))


layer_norm_fused.defvjp(_ln_fwd, _ln_bwd)


def eligible(x, g) -> bool:
    """2D activations, lane-multiple width, enough rows to amortize."""
    return (x.ndim == 2 and g.ndim == 1 and x.shape[1] % 128 == 0
            and x.shape[0] >= 2 * _BR)
