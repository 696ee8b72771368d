"""Fused short-sequence attention core — Pallas TPU kernel.

CLIP towers have tiny token counts (ViT-B/32: 50, text: 77, ViT-L/14: 257).
XLA runs the qkv/out projections at high MFU (they are big batched matmuls)
but wastes most of the attention-block time on [B,T,H,hd] <-> [B,H,T,hd]
layout transposes and HBM-materialized [B,H,T,T] score tensors (profiled at
~18ms of a 74ms step at 200 samples).  This kernel keeps the projections in
XLA and fuses ONLY the attention core, reading the merged-qkv activation
[B,T,3D] directly — heads are column slices, so no transpose ever exists —
and keeping scores/softmax in VMEM.

Tiny [T,T] per-head dots would serialize far below MXU utilization, so the
kernel MERGES THE SAMPLE BLOCK into the matmul rows: with T padded to a
sublane-tile multiple, the per-head q/k/v slices reshape (layout-free) from
[bb,T,hd] to [bb*T,hd] and one [bb*T,bb*T] masked score matmul serves all
bb samples — cross-sample blocks and padded-key columns get -inf bias, so
softmax zeroes them exactly, in the VJP too (p==0 there kills every dS/dV
term).  The ~bb-fold score overcompute is far cheaper than bb serialized
sub-tile dots.

The custom VJP computes d(qkv) from d(out); gradients then flow through the
XLA-side projections normally, so this path is exact for weight gradients.

Parity target: jax.nn.dot_product_attention (models/clip/model.py `mha`),
reference semantics CLIP model.py MultiheadAttention.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _score_dtype(compute_dtype):
    """dtype of the [n,n] score/probability intermediates in the FLAT kernels.

    The r3 chained microbench (docs/TPU_MEASUREMENTS_r3.md §6) showed the
    kernels are neither flop- nor exp-bound: ~0.09-0.11 ms per score-shaped
    dot group REGARDLESS of shape (8x flop cuts barely move time), i.e. the
    floor looks bytes-bound on the f32 [n,n] intermediates.  Opt-in
    APHANTASIA_ATTN_SCORE_BF16=1 halves those bytes by keeping scores,
    exp and probabilities in bf16 (row sums still accumulate in f32);
    probability values lose ~0.4% relative precision, so this stays off
    until an on-chip A/B shows a real win AND the tower goldens hold."""
    import os
    if (os.environ.get("APHANTASIA_ATTN_SCORE_BF16") == "1"
            and compute_dtype == jnp.bfloat16):
        return jnp.bfloat16
    return jnp.float32


def _merged_bias(bb: int, t_pad: int, t: int, causal: bool) -> jnp.ndarray:
    """Additive bias for the sample-merged [bb*t_pad, bb*t_pad] scores:
    -inf across samples, on padded key columns, and (optionally) above the
    causal diagonal within each sample block."""
    n = bb * t_pad
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ok = ((rows // t_pad) == (cols // t_pad)) & ((cols % t_pad) < t)
    if causal:
        ok = ok & ((cols % t_pad) <= (rows % t_pad))
    return jnp.where(ok, 0.0, -1e30).astype(jnp.float32)


def _fwd_kernel(qkv_ref, o_ref, inv_ref, *, bb, n_heads, t, causal):
    t_pad, d3 = qkv_ref.shape[1], qkv_ref.shape[2]
    d = d3 // 3
    hd = d // n_heads
    n = bb * t_pad
    scale = 1.0 / np.sqrt(hd)
    bias = _merged_bias(bb, t_pad, t, causal)
    qkv = qkv_ref[...].reshape(n, d3)    # ONE sample merge, then lane slices

    outs, invs = [], []
    for h_i in range(n_heads):
        q = qkv[:, h_i * hd:(h_i + 1) * hd]
        k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
        v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        # clamp instead of row-max subtraction: an elementwise op replaces a
        # cross-lane reduction; exact for |scores| < 60 (CLIP logits are
        # O(10); exp(60) and the row sums stay far inside f32 range, and the
        # -1e30 masked entries still exp to exactly 0)
        e = jnp.exp(jnp.minimum(s, 60.0))
        # the softmax division is folded into the [n,hd] OUTPUT (not the
        # [n,n] probabilities), and 1/rowsum is saved for the VJP so the
        # backward pass never redoes the sum reduction
        inv = 1.0 / jnp.sum(e, -1, keepdims=True)                # [n,1]
        o = jax.lax.dot_general(e.astype(qkv.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * inv
        outs.append(o.astype(o_ref.dtype))
        invs.append(inv)
    o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(bb, t_pad, d)
    inv_ref[...] = jnp.concatenate(invs, axis=-1).reshape(bb, t_pad, n_heads)


def _bwd_kernel(qkv_ref, do_ref, inv_ref, o_ref, dqkv_ref, *, bb, n_heads,
                t, causal):
    t_pad, d3 = qkv_ref.shape[1], qkv_ref.shape[2]
    d = d3 // 3
    hd = d // n_heads
    n = bb * t_pad
    scale = 1.0 / np.sqrt(hd)
    bias = _merged_bias(bb, t_pad, t, causal)
    qkv = qkv_ref[...].reshape(n, d3)
    do = do_ref[...].reshape(n, d)
    inv_all = inv_ref[...].reshape(n, n_heads)    # fwd's saved 1/rowsums
    o = o_ref[...].reshape(n, d)                  # fwd's saved output

    dq_parts, dk_parts, dv_parts = [], [], []
    for h_i in range(n_heads):
        q = qkv[:, h_i * hd:(h_i + 1) * hd]
        k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
        v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
        do_h = do[:, h_i * hd:(h_i + 1) * hd]
        o_h = o[:, h_i * hd:(h_i + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        e = jnp.exp(jnp.minimum(s, 60.0))     # clamp > reduce (see fwd)
        p32 = e * inv_all[:, h_i:h_i + 1]     # saved inv: no sum reduction
        p = p32.astype(qkv.dtype)
        dv = jax.lax.dot_general(p, do_h, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # flash-attention softmax-bwd identity: sum_k dp_ik p_ik = do_i.o_i
        # — a [n,hd] rowdot instead of a [n,n] reduction (measured ~15% of
        # the bwd kernel at the headline geometry)
        rs = jnp.sum(do_h.astype(jnp.float32) * o_h.astype(jnp.float32),
                     -1, keepdims=True)
        ds = p32 * (dp - rs)
        ds = (ds * scale).astype(qkv.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dt = dqkv_ref.dtype
        dq_parts.append(dq.astype(dt))
        dk_parts.append(dk.astype(dt))
        dv_parts.append(dv.astype(dt))
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
    dqkv_ref[...] = dqkv.reshape(bb, t_pad, d3)


def _fwd_kernel_flat(qkv_ref, o_ref, inv_ref, *, bb, n_heads, t, causal):
    """Flat variant: the block is [bb*t, 3d] rows of a 2D sample-major
    stream — no token padding exists anywhere (see attention_core_flat)."""
    n, d3 = qkv_ref.shape
    d = d3 // 3
    hd = d // n_heads
    scale = 1.0 / np.sqrt(hd)
    sdt = _score_dtype(qkv_ref.dtype)
    bias = _merged_bias(bb, t, t, causal).astype(sdt)
    qkv = qkv_ref[...]

    outs, invs = [], []
    for h_i in range(n_heads):
        q = qkv[:, h_i * hd:(h_i + 1) * hd]
        k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
        v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
        # Mosaic requires a 32-bit matmul accumulator; the cast AFTER the
        # dot is what shrinks the materialized [n,n] intermediate to sdt
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(sdt) * scale
        s = s + bias
        e = jnp.exp(jnp.minimum(s, 60.0))       # clamp > reduce; weak-typed
        inv = 1.0 / jnp.sum(e, -1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(e.astype(qkv.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * inv
        outs.append(o.astype(o_ref.dtype))
        invs.append(inv)
    o_ref[...] = jnp.concatenate(outs, axis=-1)
    inv_ref[...] = jnp.concatenate(invs, axis=-1)


def _bwd_kernel_flat(qkv_ref, do_ref, inv_ref, o_ref, dqkv_ref, *, bb,
                     n_heads, t, causal):
    n, d3 = qkv_ref.shape
    d = d3 // 3
    hd = d // n_heads
    scale = 1.0 / np.sqrt(hd)
    sdt = _score_dtype(qkv_ref.dtype)
    bias = _merged_bias(bb, t, t, causal).astype(sdt)
    qkv = qkv_ref[...]
    do = do_ref[...]
    inv_all = inv_ref[...]
    o = o_ref[...]

    dt = dqkv_ref.dtype
    for h_i in range(n_heads):
        q = qkv[:, h_i * hd:(h_i + 1) * hd]
        k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
        v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
        do_h = do[:, h_i * hd:(h_i + 1) * hd]
        o_h = o[:, h_i * hd:(h_i + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(sdt) * scale
        s = s + bias
        e = jnp.exp(jnp.minimum(s, 60.0))
        # probabilities in the score dtype: [n,n] stays bf16 end-to-end
        # under APHANTASIA_ATTN_SCORE_BF16 (inv is f32 [n,1]; the product
        # is forced back down so no f32 [n,n] copy materializes)
        p32 = e * inv_all[:, h_i:h_i + 1].astype(sdt)
        p = p32.astype(qkv.dtype)
        dv = jax.lax.dot_general(p, do_h, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(sdt)
        # flash-attention identity: sum_k dp_ik p_ik = do_i.o_i (see
        # _bwd_kernel) — kills the [n,n] rowsum reduction
        rs = jnp.sum(do_h.astype(jnp.float32) * o_h.astype(jnp.float32),
                     -1, keepdims=True)
        ds = p32 * (dp - rs.astype(sdt))
        ds = (ds * scale).astype(qkv.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # per-head stores (lane slices at hd multiples): holding all
        # 3*n_heads parts for one big concat overflows the VMEM stack at
        # 400-row blocks (measured 17.2M > 16M limit)
        dqkv_ref[:, h_i * hd:(h_i + 1) * hd] = dq.astype(dt)
        dqkv_ref[:, d + h_i * hd:d + (h_i + 1) * hd] = dk.astype(dt)
        dqkv_ref[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd] = dv.astype(dt)


def _tile(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _geometry(t: int, dtype):
    """(t_pad, bb): pad T to a sublane tile, merge samples into blocks.

    APHANTASIA_ATTN_PAD_ROWS sets the merged-row target (default 256 ->
    bb=4 at t_pad=64).  128 gives bb=2: exact [128,128] score tiles with
    3.3x key-column overcompute vs the flat kernel's alignment-pinned 8x
    (bb=8 is the SMALLEST flat block at t=50/bf16, so only this padded
    path can reach small blocks — the r3 ATTN_ROWS sweep never could)."""
    import os
    tile = _tile(dtype)
    t_pad = -(-t // tile) * tile
    target = int(os.environ.get("APHANTASIA_ATTN_PAD_ROWS", "256"))
    bb = max(1, target // t_pad)
    return t_pad, bb


def _pad_bt(x, bb, t_pad):
    b, t = x.shape[0], x.shape[1]
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    pad_b = (-b) % bb
    if pad_b:
        x = jnp.concatenate([x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)])
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def attention_core(qkv, n_heads, causal=False, valid_t=None):
    """softmax(q k^T/√hd [+ causal bias]) v over merged-qkv layout.

    qkv [B,T,3D] (columns: q heads, k heads, v heads) -> out [B,T,D].
    `valid_t`: number of real tokens when T is already pre-padded by the
    caller (rows >= valid_t are key-masked; their outputs are garbage the
    caller must never read) — pre-padding the whole tower once avoids a
    per-layer pad+slice round trip.  Exact VJP (d_qkv).
    """
    out, _ = _core_fwd(qkv, n_heads, causal, valid_t)
    return out


def _core_fwd(qkv, n_heads, causal, valid_t):
    b, t, d3 = qkv.shape
    d = d3 // 3
    t_v = valid_t or t
    t_pad, bb = _geometry(t, qkv.dtype)
    qp = _pad_bt(qkv, bb, t_pad)
    bp = qp.shape[0]

    out, inv = pl.pallas_call(
        functools.partial(_fwd_kernel, bb=bb, n_heads=n_heads, t=t_v,
                          causal=causal),
        grid=(bp // bb,),
        in_specs=[pl.BlockSpec((bb, t_pad, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bb, t_pad, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bb, t_pad, n_heads), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((bp, t_pad, d), qkv.dtype),
                   jax.ShapeDtypeStruct((bp, t_pad, n_heads), jnp.float32)),
        interpret=_interpret(),
    )(qp)
    out = out[:b, :t]
    # `out` rides the residuals for the bwd flash identity (rs = do.o);
    # the tower is frozen, so nothing else retains it — net cost is one
    # [b,t,d] HBM read in bwd vs a [n,n]-wide rowsum per head.
    return out, (qkv, inv, out)


def _core_bwd(n_heads, causal, valid_t, res, do):
    qkv, inv, out = res
    b, t, d3 = qkv.shape
    d = d3 // 3
    t_v = valid_t or t
    t_pad, bb = _geometry(t, qkv.dtype)
    qp = _pad_bt(qkv, bb, t_pad)
    dop = _pad_bt(do.astype(qkv.dtype), bb, t_pad)
    op = _pad_bt(out.astype(qkv.dtype), bb, t_pad)
    bp = qp.shape[0]

    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, bb=bb, n_heads=n_heads, t=t_v,
                          causal=causal),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, t_pad, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t_pad, n_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t_pad, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t_pad, d3), qkv.dtype),
        interpret=_interpret(),
    )(qp, dop, inv, op)
    return (dqkv[:b, :t],)


attention_core.defvjp(_core_fwd, _core_bwd)


# ------------------------------------------------------------- flat variant

def flat_geometry(t: int, dtype):
    """Samples per block `bb` for the flat (un-padded) kernel, or None when
    the geometry is unusable.

    Unlike `attention_core`, T is NEVER padded: the 2D sample-major stream
    is cut into blocks of bb*t rows, with bb chosen so bb*t is a multiple
    of the sublane tile (t=50 bf16 -> bb=8, 400 rows) and >= the target row
    count for MXU occupancy. Returns None when alignment would force huge
    blocks (e.g. odd T like 257 -> bb=16 -> 4112-row scores blow VMEM).

    APHANTASIA_ATTN_ROWS overrides the ~256-row target (perf sweep knob:
    bigger blocks amortize the per-block grid overhead but the
    cross-sample score overcompute grows linearly with bb)."""
    import os
    target = int(os.environ.get("APHANTASIA_ATTN_ROWS", "256"))
    tile = _tile(dtype)
    bb = 1
    while (bb * t) % tile != 0:
        bb += 1
    while bb * t < target:
        bb *= 2
    if bb * t > max(1024, target):
        return None
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def attention_core_flat(qkv, n_heads, t, causal=False):
    """softmax(q k^T/√hd) v over a FLAT sample-major stream — zero padding.

    qkv [R, 3D] with R = b*t rows (sample-major: rows i*t..(i+1)*t-1 are
    sample i) -> out [R, D].  Built for the un-padded ViT residual stream:
    keeping activations [b*t, d] instead of [b, t_pad, d] removes the
    t_pad/t (64/50 for ViT-B) flops overhead from EVERY projection/MLP
    matmul in the tower; this kernel is the only op that needs the sample
    structure, and it gets it from iota arithmetic, not from layout.
    Exact VJP (d_qkv)."""
    out, _ = _flat_fwd(qkv, n_heads, t, causal)
    return out


def _pad_rows(x, block):
    r = x.shape[0]
    pad = (-r) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    return x


def _flat_fwd(qkv, n_heads, t, causal):
    r, d3 = qkv.shape
    d = d3 // 3
    bb = flat_geometry(t, qkv.dtype)
    assert bb is not None, f"flat attention unusable for t={t}"
    block = bb * t
    qp = _pad_rows(qkv, block)
    rp = qp.shape[0]

    out, inv = pl.pallas_call(
        functools.partial(_fwd_kernel_flat, bb=bb, n_heads=n_heads, t=t,
                          causal=causal),
        grid=(rp // block,),
        in_specs=[pl.BlockSpec((block, d3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((block, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block, n_heads), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rp, d), qkv.dtype),
                   jax.ShapeDtypeStruct((rp, n_heads), jnp.float32)),
        interpret=_interpret(),
    )(qp)
    out = out[:r]
    return out, (qkv, inv, out)    # out: bwd flash identity (see _core_fwd)


def _flat_bwd(n_heads, t, causal, res, do):
    qkv, inv, out = res
    r, d3 = qkv.shape
    d = d3 // 3
    bb = flat_geometry(t, qkv.dtype)
    block = bb * t
    qp = _pad_rows(qkv, block)
    dop = _pad_rows(do.astype(qkv.dtype), block)
    invp = _pad_rows(inv, block)
    op = _pad_rows(out.astype(qkv.dtype), block)
    rp = qp.shape[0]

    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_flat, bb=bb, n_heads=n_heads, t=t,
                          causal=causal),
        grid=(rp // block,),
        in_specs=[
            pl.BlockSpec((block, d3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_heads), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, d3), qkv.dtype),
        interpret=_interpret(),
    )(qp, dop, invp, op)
    return (dqkv[:r],)


attention_core_flat.defvjp(_flat_fwd, _flat_bwd)
