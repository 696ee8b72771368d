"""Pallas TPU kernel for the cutout gather-resize (optional, `--pallas`).

The XLA path (ops/sampler.py) materializes a [S,C,M,W] intermediate in HBM
between the two interpolation matmuls.  This kernel keeps the full frame
resident in VMEM across the sample grid instead.  NOTE: since the XLA
path's scatter-free weight build landed, the XLA formulation measures
FASTER at the headline config (its batched matmuls beat this kernel's
per-sample serialization), so this stays opt-in — it wins only when HBM
pressure matters more than MXU occupancy (very large frames with small
sample counts).  Per sample it computes

    cut[c] = (Wy @ img[c]) @ Wx^T

with the interpolation matrices built in-kernel from the 4-tap bicubic
indices/weights via iota comparisons (no scatter), so the only HBM traffic
is the frame (once) and the cutout outputs.  A custom VJP accumulates
d_img = sum_s Wy^T @ d_cut @ Wx in a VMEM accumulator with a constant
output block across the grid.

VMEM budget at 720p: frame bf16 5.5MB + Wy/Wx/tmp ~3MB + out block < 1MB.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # run interpreted off-TPU so CPU tests exercise the kernel
    return jax.default_backend() not in ("tpu", "axon")


def _build_w(idx_ref, w_ref, n_in: int, m: int, transpose: bool):
    """Dense interpolation matrix from taps: [M, n_in] (or transposed)."""
    idx = idx_ref[0]                                   # [M,4] int32
    w = w_ref[0]                                       # [M,4] f32
    if transpose:
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_in, m), 0)
        acc = jnp.zeros((n_in, m), jnp.float32)
        for a in range(4):
            acc = acc + jnp.where(cols == idx[:, a][None, :],
                                  w[:, a][None, :], 0.0)
        return acc                                      # [n_in, M]
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n_in), 1)
    acc = jnp.zeros((m, n_in), jnp.float32)
    for a in range(4):
        acc = acc + jnp.where(cols == idx[:, a][:, None],
                              w[:, a][:, None], 0.0)
    return acc                                          # [M, n_in]


def _fwd_kernel(img_ref, yidx_ref, yw_ref, xidx_ref, xw_ref, out_ref,
                *, h, w, m, c):
    wy = _build_w(yidx_ref, yw_ref, h, m, transpose=False)      # [M,H]
    wxt = _build_w(xidx_ref, xw_ref, w, m, transpose=True)      # [W,M]
    wy = wy.astype(img_ref.dtype)
    wxt = wxt.astype(img_ref.dtype)
    for ch in range(c):
        tmp = jnp.dot(wy, img_ref[ch], preferred_element_type=jnp.float32)
        out_ref[0, ch] = jnp.dot(tmp.astype(img_ref.dtype), wxt,
                                 preferred_element_type=jnp.float32)


def _bwd_kernel(g_ref, yidx_ref, yw_ref, xidx_ref, xw_ref, dimg_ref,
                *, h, w, m, c):
    s_i = pl.program_id(0)

    @pl.when(s_i == 0)
    def _():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    wyt = _build_w(yidx_ref, yw_ref, h, m, transpose=True)      # [H,M]
    wx = _build_w(xidx_ref, xw_ref, w, m, transpose=False)      # [M,W]
    for ch in range(c):
        tmp = jnp.dot(wyt, g_ref[0, ch], preferred_element_type=jnp.float32)
        dimg_ref[ch] += jnp.dot(tmp, wx, preferred_element_type=jnp.float32)


def pallas_cut(sampler, img, boxes):
    """img [C,H,W] (or [1,C,H,W]), boxes -> cutouts [S,C,M,M] float32."""
    if img.ndim == 4:
        img = img[0]
    return _pallas_cut(sampler, img.astype(jnp.float32), boxes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cut(sampler, img, boxes):
    out, _ = _pallas_cut_fwd(sampler, img, boxes)
    return out


def _taps(sampler, boxes):
    yidx, yw, xidx, xw = sampler.tap_indices(boxes)
    return (yidx.astype(jnp.int32), yw.astype(jnp.float32),
            xidx.astype(jnp.int32), xw.astype(jnp.float32))


def _pallas_cut_fwd(sampler, img, boxes):
    c, h, w = img.shape
    m = sampler.modsize
    s = sampler.count
    yidx, yw, xidx, xw = _taps(sampler, boxes)
    imgc = img.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, m=m, c=c),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, m, m), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, c, m, m), jnp.float32),
        interpret=_interpret(),
    )(imgc, yidx, yw, xidx, xw)
    return out, (yidx, yw, xidx, xw)


def _pallas_cut_bwd(sampler, res, g):
    (yidx, yw, xidx, xw) = res
    h, w = sampler.frame_size
    c = 3
    m = sampler.modsize
    s = sampler.count

    dimg = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, m=m, c=c),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, c, m, m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=_interpret(),
    )(g.astype(jnp.float32), yidx, yw, xidx, xw)
    return dimg, None


_pallas_cut.defvjp(_pallas_cut_fwd, _pallas_cut_bwd)
