"""Fused ViT residual-block halves — Pallas TPU kernels.

The flat attention core (ops/pallas_attn.py) already keeps scores/softmax in
VMEM, but the rest of the block still round-trips every intermediate through
HBM: per layer and step the [b*t, d] stream writes+reads LN outputs, the
[b*t, 3d] merged qkv, the attention output, both MLP activations — several
hundred MB/layer at 200 samples, which is where the tower forward loses its
last ~2x vs matmul-ideal (docs/ROUND2_NOTES.md step-cost profile).

These kernels fuse each half-block into ONE pallas_call over 2D row blocks
of the sample-major stream:

  attn_half: y = x + out_proj(attention(qkv_proj(LN1(x))))
  mlp_half:  y = x + proj(quick_gelu(fc(LN2(x))))

Weights ride as whole-array VMEM blocks (cast to the stream dtype on the
host, exactly like the XLA path's `.astype(x.dtype)`) with constant index
maps, so Mosaic keeps them resident across grid steps; the only HBM traffic
per half is the x read and the y write.  The backward kernels RECOMPUTE the
forward pieces in VMEM from x (saving only the softmax 1/rowsums, like the
flat core) and produce dx ONLY — CLIP towers are frozen, gradients flow to
the image, so no weight cotangents are ever materialized (zeros are
returned for JAX's VJP signature and DCE'd).

Parity targets: models/clip/model.py `resblock_flat` (layer_norm's one-pass
fp32 moments, quick_gelu, the merged-qkv flat attention with its
clamp-not-reduce softmax, bf16 bias adds).  Vision towers only
(causal=False).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphantasia_tpu.ops.pallas_attn import _merged_bias, _interpret


def _ln_f32(x, g, b, eps=1e-5):
    """models/clip/model.py:layer_norm — one-pass fp32 moments; returns
    (normalized in x.dtype, xhat f32, inv_sigma f32) for reuse in bwd."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return (xhat * g + b).astype(x.dtype), xhat, inv


def _ln_bwd_f32(dh, g, xhat, inv, out_dtype):
    """dx of h = xhat*g + b given dh (f32 math, per row)."""
    dxhat = dh.astype(jnp.float32) * g
    m1 = dxhat.mean(-1, keepdims=True)
    m2 = (dxhat * xhat).mean(-1, keepdims=True)
    return ((dxhat - m1 - xhat * m2) * inv).astype(out_dtype)


def _matmul_bias(x, w, b):
    """x @ w + b in the XLA path's dtype discipline: bf16 operands, f32 MXU
    accumulation, bf16 output, bf16 bias add."""
    out = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    return out if b is None else out + b


def _matmul_t(x, w):
    """x @ w^T (contract w's output dim) — f32 accumulation."""
    return jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_fwd_core(qkv, bias, n_heads, o_dtype):
    """The flat attention core (pallas_attn._fwd_kernel_flat math) on an
    in-VMEM [R,3d] activation; returns (out [R,d], inv [R,nh] f32)."""
    n, d3 = qkv.shape
    d = d3 // 3
    hd = d // n_heads
    scale = 1.0 / np.sqrt(hd)
    outs, invs = [], []
    for h_i in range(n_heads):
        q = qkv[:, h_i * hd:(h_i + 1) * hd]
        k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
        v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        e = jnp.exp(jnp.minimum(s, 60.0))     # clamp > reduce (pallas_attn)
        inv = 1.0 / jnp.sum(e, -1, keepdims=True)
        o = jax.lax.dot_general(e.astype(qkv.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * inv
        outs.append(o.astype(o_dtype))
        invs.append(inv)
    return jnp.concatenate(outs, -1), jnp.concatenate(invs, -1)


def _attn_bwd_core(qkv, do, inv_all, bias, n_heads, out_dtype):
    """dqkv of the flat attention core given do and the saved 1/rowsums
    (pallas_attn._bwd_kernel_flat math)."""
    n, d3 = qkv.shape
    d = d3 // 3
    hd = d // n_heads
    scale = 1.0 / np.sqrt(hd)
    parts_q, parts_k, parts_v = [], [], []
    for h_i in range(n_heads):
        q = qkv[:, h_i * hd:(h_i + 1) * hd]
        k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
        v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
        do_h = do[:, h_i * hd:(h_i + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        e = jnp.exp(jnp.minimum(s + bias, 60.0))
        p32 = e * inv_all[:, h_i:h_i + 1]
        p = p32.astype(qkv.dtype)
        dv = jax.lax.dot_general(p, do_h, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
        ds = (ds * scale).astype(qkv.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        parts_q.append(dq.astype(out_dtype))
        parts_k.append(dk.astype(out_dtype))
        parts_v.append(dv.astype(out_dtype))
    return jnp.concatenate(parts_q + parts_k + parts_v, -1)


# ------------------------------------------------------------ attention half

def _attn_half_fwd_kernel(x_ref, g_ref, b_ref, inw_ref, inb_ref, outw_ref,
                          outb_ref, y_ref, inv_ref, *, bb, n_heads, t):
    bias = _merged_bias(bb, t, t, False)
    x = x_ref[...]
    h, _, _ = _ln_f32(x, g_ref[...], b_ref[...])
    qkv = _matmul_bias(h, inw_ref[...], inb_ref[...])
    o, inv = _attn_fwd_core(qkv, bias, n_heads, x.dtype)
    y = _matmul_bias(o, outw_ref[...], outb_ref[...])
    y_ref[...] = x + y
    inv_ref[...] = inv


def _attn_half_bwd_kernel(x_ref, dy_ref, inv_ref, g_ref, b_ref, inw_ref,
                          inb_ref, outw_ref, dx_ref, *, bb, n_heads, t):
    # The full-block backward peaks over v5e's 16M scoped-VMEM limit
    # (measured 16.28M monolithic / 17.29M with a partial split,
    # docs/TPU_MEASUREMENTS_r3.md), so the WHOLE remat+backward runs per
    # sample-half: LN, qkv, attention core, dh and the LN backward each
    # touch only rows-sized buffers (4t rows — still MXU-viable), and a
    # half's transients die before the next starts.  Numerics identical:
    # every op is rowwise or within-sample (the merged [R,R] score mats
    # were block-diagonal overcompute anyway).
    g = g_ref[...]
    b = b_ref[...]
    inw = inw_ref[...]
    outw = outw_ref[...]
    inb = inb_ref[...]
    # quarters: the half split still measured 16.02M (20K over!) — the
    # per-slice transients shrink linearly and the one concat store stays
    halves = 4 if bb % 4 == 0 else (2 if bb % 2 == 0 and bb > 1 else 1)
    rows = (bb // halves) * t
    bias = _merged_bias(bb // halves, t, t, False)
    xall = x_ref[...]
    dyall = dy_ref[...]
    invall = inv_ref[...]
    parts = []
    for i in range(halves):
        sl = slice(i * rows, (i + 1) * rows)
        x = xall[sl]
        dy = dyall[sl]
        h, xhat, invs = _ln_f32(x, g, b)
        qkv = _matmul_bias(h, inw, inb)
        do = _matmul_t(dy, outw).astype(x.dtype)
        dqkv = _attn_bwd_core(qkv, do, invall[sl], bias, n_heads, x.dtype)
        dh = _matmul_t(dqkv, inw)
        parts.append(dy + _ln_bwd_f32(dh, g, xhat, invs, x.dtype))
    # one aligned full-block store (rows=4t is not sublane-tile aligned
    # for bf16, so per-half stores would be rejected by Mosaic)
    dx_ref[...] = parts[0] if halves == 1 else jnp.concatenate(parts, 0)


# ------------------------------------------------------------------ MLP half

def _quick_gelu_f32(u):
    s = jax.nn.sigmoid(1.702 * u)
    return u * s, s


def _mlp_half_fwd_kernel(x_ref, g_ref, b_ref, fcw_ref, fcb_ref, pw_ref,
                         pb_ref, y_ref):
    x = x_ref[...]
    h, _, _ = _ln_f32(x, g_ref[...], b_ref[...])
    u = _matmul_bias(h, fcw_ref[...], fcb_ref[...])
    a, _ = _quick_gelu_f32(u.astype(jnp.float32))
    y = _matmul_bias(a.astype(x.dtype), pw_ref[...], pb_ref[...])
    y_ref[...] = x + y


def _mlp_half_bwd_kernel(x_ref, dy_ref, g_ref, b_ref, fcw_ref, fcb_ref,
                         pw_ref, dx_ref):
    x = x_ref[...]
    dy = dy_ref[...]
    g = g_ref[...]
    h, xhat, invs = _ln_f32(x, g, b_ref[...])
    fcw = fcw_ref[...]
    u = _matmul_bias(h, fcw, fcb_ref[...])
    uf = u.astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * uf)
    da = _matmul_t(dy, pw_ref[...])
    du = (da * (s + 1.702 * uf * s * (1.0 - s))).astype(x.dtype)
    dh = _matmul_t(du, fcw)
    dx_ref[...] = dy + _ln_bwd_f32(dh, g, xhat, invs, x.dtype)


# -------------------------------------------------------------- host wrappers

def _whole(shape):
    """Whole-array VMEM block with a constant index map — Mosaic skips the
    re-fetch when consecutive grid steps map to the same block, so weights
    stay resident."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _rows(block, width):
    return pl.BlockSpec((block, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _pad_rows(x, block):
    pad = (-x.shape[0]) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def attn_half(x, g, b, in_w, in_b, out_w, out_b, n_heads, t, bb):
    """x [R,d] (flat sample-major, R = batch*t) ->
    x + out_proj(attention(qkv_proj(LN(x)))).  Frozen weights (dx-only
    VJP).  `bb` from pallas_attn.flat_geometry."""
    y, _ = _attn_half_fwd(x, g, b, in_w, in_b, out_w, out_b, n_heads, t, bb)
    return y


def _attn_half_args(x, g, b, in_w, in_b, out_w, out_b):
    """Cast weights/biases to the stream dtype on the host (the XLA path's
    `.astype(x.dtype)`); LN affine stays f32 (layer_norm applies it in
    f32)."""
    dt = x.dtype
    f32 = jnp.float32
    r2 = lambda v: v.reshape(1, -1)   # 1D vectors -> (1,n): Mosaic wants 2D
    return (r2(g.astype(f32)), r2(b.astype(f32)), in_w.astype(dt),
            r2(in_b.astype(dt)), out_w.astype(dt),
            None if out_b is None else r2(out_b.astype(dt)))


def _attn_half_fwd(x, g, b, in_w, in_b, out_w, out_b, n_heads, t, bb):
    r, d = x.shape
    block = bb * t
    xp = _pad_rows(x, block)
    rp = xp.shape[0]
    gc, bc, inw, inb, outw, outb = _attn_half_args(x, g, b, in_w, in_b,
                                                   out_w, out_b)
    y, inv = pl.pallas_call(
        functools.partial(_attn_half_fwd_kernel, bb=bb, n_heads=n_heads,
                          t=t),
        grid=(rp // block,),
        in_specs=[_rows(block, d), _whole(gc.shape), _whole(bc.shape),
                  _whole(inw.shape), _whole(inb.shape), _whole(outw.shape),
                  _whole(outb.shape)],
        out_specs=(_rows(block, d), _rows(block, n_heads)),
        out_shape=(jax.ShapeDtypeStruct((rp, d), x.dtype),
                   jax.ShapeDtypeStruct((rp, n_heads), jnp.float32)),
        interpret=_interpret(),
    )(xp, gc, bc, inw, inb, outw, outb)
    return y[:r], (x, g, b, in_w, in_b, out_w, out_b, inv[:r])


def _attn_half_bwd(n_heads, t, bb, res, dy):
    x, g, b, in_w, in_b, out_w, out_b, inv = res
    r, d = x.shape
    block = bb * t
    xp = _pad_rows(x, block)
    dyp = _pad_rows(dy.astype(x.dtype), block)
    invp = _pad_rows(inv, block)
    rp = xp.shape[0]
    gc, bc, inw, inb, outw, _ = _attn_half_args(x, g, b, in_w, in_b,
                                                out_w, None)
    dx = pl.pallas_call(
        functools.partial(_attn_half_bwd_kernel, bb=bb, n_heads=n_heads,
                          t=t),
        grid=(rp // block,),
        in_specs=[_rows(block, d), _rows(block, d), _rows(block, n_heads),
                  _whole(gc.shape), _whole(bc.shape), _whole(inw.shape),
                  _whole(inb.shape), _whole(outw.shape)],
        out_specs=_rows(block, d),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        interpret=_interpret(),
    )(xp, dyp, invp, gc, bc, inw, inb, outw)
    z = lambda a: jnp.zeros_like(a)   # frozen weights; DCE'd  # noqa: E731
    return (dx[:r], z(g), z(b), z(in_w), z(in_b), z(out_w), z(out_b))


attn_half.defvjp(_attn_half_fwd, _attn_half_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def mlp_half(x, g, b, fc_w, fc_b, p_w, p_b, block):
    """x [R,d] -> x + proj(quick_gelu(fc(LN(x)))).  Frozen weights."""
    y, _ = _mlp_half_fwd(x, g, b, fc_w, fc_b, p_w, p_b, block)
    return y


def _mlp_half_fwd(x, g, b, fc_w, fc_b, p_w, p_b, block):
    r, d = x.shape
    xp = _pad_rows(x, block)
    rp = xp.shape[0]
    dt = x.dtype
    f32 = jnp.float32
    r2 = lambda v: v.reshape(1, -1)
    gc, bc = r2(g.astype(f32)), r2(b.astype(f32))
    fcw, fcb = fc_w.astype(dt), r2(fc_b.astype(dt))
    pw, pb = p_w.astype(dt), r2(p_b.astype(dt))
    y = pl.pallas_call(
        _mlp_half_fwd_kernel,
        grid=(rp // block,),
        in_specs=[_rows(block, d), _whole(gc.shape), _whole(bc.shape),
                  _whole(fcw.shape), _whole(fcb.shape), _whole(pw.shape),
                  _whole(pb.shape)],
        out_specs=_rows(block, d),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        interpret=_interpret(),
    )(xp, gc, bc, fcw, fcb, pw, pb)
    return y[:r], (x, g, b, fc_w, fc_b, p_w)


def _mlp_half_bwd(block, res, dy):
    x, g, b, fc_w, fc_b, p_w = res
    r, d = x.shape
    xp = _pad_rows(x, block)
    dyp = _pad_rows(dy.astype(x.dtype), block)
    rp = xp.shape[0]
    dt = x.dtype
    f32 = jnp.float32
    r2 = lambda v: v.reshape(1, -1)
    gc, bc = r2(g.astype(f32)), r2(b.astype(f32))
    fcw, fcb = fc_w.astype(dt), r2(fc_b.astype(dt))
    pw = p_w.astype(dt)
    dx = pl.pallas_call(
        _mlp_half_bwd_kernel,
        grid=(rp // block,),
        in_specs=[_rows(block, d), _rows(block, d), _whole(gc.shape),
                  _whole(bc.shape), _whole(fcw.shape), _whole(fcb.shape),
                  _whole(pw.shape)],
        out_specs=_rows(block, d),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        interpret=_interpret(),
    )(xp, dyp, gc, bc, fcw, fcb, pw)
    z = lambda a: jnp.zeros_like(a)  # noqa: E731
    return (dx[:r], z(g), z(b), z(fc_w), z(fc_b), z(p_w), z(p_w[0]))


mlp_half.defvjp(_mlp_half_fwd, _mlp_half_bwd)


def resblock_flat_fused(x, p, n_heads, t, bb):
    """One ViT residual block over the flat stream, as two fused kernels
    (parity target: models/clip/model.py resblock_flat)."""
    a = p["attn"]
    m = p["mlp"]
    x = attn_half(x, p["ln_1"]["g"], p["ln_1"]["b"], a["in_w"], a["in_b"],
                  a["out_w"], a["out_b"], n_heads, t, bb)
    # the MLP half is pure rowwise — block rows are free to differ from the
    # attention geometry.  Cap at 128: the backward keeps f32 [block, 4d]
    # activations + both weight matrices in VMEM, and v5e's 16M scoped
    # limit OOMs at bb*t blocks (measured: 19.3M at [10000,768] bf16,
    # docs/TPU_MEASUREMENTS_r3.md)
    return mlp_half(x, p["ln_2"]["g"], p["ln_2"]["b"], m["fc_w"], m["fc_b"],
                    m["proj_w"], m["proj_b"], min(bb * t, 128))
