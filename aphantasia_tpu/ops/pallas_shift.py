"""Fused fractional-shift pass — Pallas TPU kernel.

The separable aug warp's shear passes (ops/sep_warp.py) run as
analysis-matmul -> per-row phase rotation -> synthesis-matmul.  Under XLA
the [rows, 2nf] spectrum round-trips HBM between the two dots and the
per-row cos/sin runs as a separate fusion (measured: the x-shift pass costs
~2.1ms/step at 200x224 cutouts vs ~1.1ms for its two matmuls alone).  This
kernel runs the whole pass per row-tile with the spectrum resident in VMEM
and the phase computed in-register, so HBM traffic is exactly input+output.

The op is linear in x with S(shift)^T == S(-shift) under swapped row/column
windows (see sep_warp fractional_shift's custom VJP) — the backward pass is
the SAME kernel on the cotangent with negated shift and the analysis/
synthesis slices exchanged, so no phase residuals are ever stored.

Status: OPT-IN (`APHANTASIA_PALLAS_SHIFT=1`).  Inside the FULL training
step the kernel measured a net loss (19.4 vs 23.4 it/s at the headline
bench config) even though it beats the isolated pass in microbenchmarks:
the XLA path shares the cos/sin phase residuals between forward and VJP
(this kernel recomputes them), and XLA fuses the phase work into
neighboring ops the kernel boundary forecloses.  Kept with full parity
tests (tests/test_pallas_shift.py) as the starting point for a future
fwd+bwd-fused attempt.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def enabled() -> bool:
    return (not _interpret()
            and bool(os.environ.get("APHANTASIA_PALLAS_SHIFT")))


_BLOCK = 512   # rows per grid step; [B,2nf] f32 spectrum stays well under VMEM


def _kernel(x_ref, sh_ref, a_ref, syn_ref, o_ref, *, nf, n, dtype_name):
    dt = jnp.dtype(dtype_name)
    f = jax.lax.dot(x_ref[...], a_ref[...],
                    preferred_element_type=jnp.float32)        # [B, 2nf]
    fr, fi = f[:, :nf], f[:, nf:]
    # tpu.iota only emits integers; cast to float after
    k = jax.lax.broadcasted_iota(jnp.int32, (1, nf), 1).astype(jnp.float32)
    phi = (-2.0 * np.pi / n) * sh_ref[...] * k                  # [B, nf]
    c = jnp.cos(phi)
    s = jnp.sin(phi)
    g = jnp.concatenate([fr * c - fi * s, fr * s + fi * c],
                        axis=-1).astype(dt)
    o_ref[...] = jax.lax.dot(g, syn_ref[...],
                             preferred_element_type=jnp.float32)


def _run(x2d, sh2d, analysis, synthesis, nf, n, dtype_name):
    r, n_in = x2d.shape
    out = synthesis.shape[1]
    pad = (-r) % _BLOCK
    if pad:
        x2d = jnp.concatenate(
            [x2d, jnp.zeros((pad, n_in), x2d.dtype)])
        sh2d = jnp.concatenate([sh2d, jnp.zeros((pad, 1), sh2d.dtype)])
    grid = (x2d.shape[0] // _BLOCK,)
    o = pl.pallas_call(
        functools.partial(_kernel, nf=nf, n=n, dtype_name=dtype_name),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK, n_in), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec(analysis.shape, lambda i: (0, 0)),
            pl.BlockSpec(synthesis.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK, out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], out), jnp.float32),
        interpret=_interpret(),
    )(x2d, sh2d, analysis, synthesis)
    return o[:r]


def _consts(n, dtype_name, row_window, col_window):
    """Sliced shared analysis/synthesis constants (see sep_warp
    _dft_mats_packed_jnp for why these must be shared jnp arrays)."""
    from aphantasia_tpu.ops.sep_warp import _dft_mats_packed_jnp
    analysis, synthesis = _dft_mats_packed_jnp(n, dtype_name)
    a = analysis[row_window[0]:row_window[0] + row_window[1]]
    syn = synthesis[:, col_window[0]:col_window[0] + col_window[1]]
    return a, syn


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pallas_frac_shift_last(x, shift, dtype_name, n, in_offset, out_window):
    """Fractional shift along the LAST axis of x [..., n_in] by per-row
    `shift` (broadcastable to x.shape[:-1]); windowed exactly like
    sep_warp._frac_shift_impl.  Returns [..., out_window[1]] float32."""
    return _apply(x, shift, dtype_name, n, in_offset, out_window)


def _apply(x, shift, dtype_name, n, in_offset, out_window):
    lead = x.shape[:-1]
    n_in = x.shape[-1]
    nf = n // 2 + 1
    a, syn = _consts(n, dtype_name, (in_offset, n_in), out_window)
    x2d = x.reshape(-1, n_in).astype(jnp.dtype(dtype_name))
    sh2d = jnp.broadcast_to(shift, lead).astype(jnp.float32).reshape(-1, 1)
    o = _run(x2d, sh2d, a, syn, nf, n, dtype_name)
    return o.reshape(lead + (out_window[1],))


def _pfs_fwd(x, shift, dtype_name, n, in_offset, out_window):
    out = _apply(x, shift, dtype_name, n, in_offset, out_window)
    return out, (shift, x.shape[-1])


def _pfs_bwd(dtype_name, n, in_offset, out_window, res, g):
    shift, in_size = res
    # transpose: cotangent lives on the fwd OUTPUT window and lands back on
    # the fwd INPUT window, with the phase negated
    gx = _apply(g, -shift, dtype_name, n, out_window[0],
                (in_offset, in_size))
    return gx, jnp.zeros(jnp.shape(shift), jnp.float32)


pallas_frac_shift_last.defvjp(_pfs_fwd, _pfs_bwd)
