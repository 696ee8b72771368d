"""Separable affine warping — gather-free, TPU-native.

Why: XLA lowers arbitrary-index bilinear warps (grid_sample-style gathers) on
TPU to slow gathers, and their VJP to catastrophic scatters (~13s/step at 200
samples).  This module decomposes any per-sample affine warp A = L·D·U
(shear-y · scale · shear-x, LDU of the 2x2 block) into:

  * shear passes: per-row / per-column FRACTIONAL SHIFTS via rFFT phase
    multiplication (exact translation, O(n log n), lowered to MXU-friendly
    ops, trivially differentiable — the transpose is the conjugate phase);
  * scale passes: per-sample 1D interpolation matrices built by iota
    comparison (no scatter) and applied as batched matmuls (MXU).

The decomposition is exact for the affine map; resampling uses band-limited
(sinc) interpolation along shear axes and bilinear along scale axes.  Inputs
are zero-padded so FFT wrap-around never reaches the output crop.

Used by ops/augs.py for the per-cutout augmentation warps (rotation,
affine-fit perspective, jitter) — the hot path of the training step.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


import functools


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int):
    """Real DFT analysis/synthesis matrices (numpy, cached per length).

    XLA's TPU FFT lowering is far off the roofline for these shapes; MXU
    matmuls beat it by an order of magnitude.  Returns
    (cos_f [n,nf], sin_f [n,nf], cos_i [nf,n], sin_i [nf,n]) with the
    irfft weighting folded into the synthesis matrices."""
    nf = n // 2 + 1
    j = np.arange(n)[:, None]
    k = np.arange(nf)[None, :]
    ang = 2.0 * np.pi * j * k / n
    cos_f = np.cos(ang).astype(np.float32)           # analysis (real part)
    sin_f = -np.sin(ang).astype(np.float32)          # analysis (imag part)
    w = np.full(nf, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    cos_i = (np.cos(ang) * w[None, :] / n).astype(np.float32).T   # [nf,n]
    sin_i = (np.sin(ang) * w[None, :] / n).astype(np.float32).T
    return cos_f, sin_f, cos_i, sin_i


@functools.lru_cache(maxsize=32)
def _dft_mats_packed(n: int):
    """Analysis [n, 2nf] = [cos|sin] and synthesis [2nf, n] = [[cos],[-sin]]
    so each shift pass is exactly TWO matmuls instead of four."""
    cos_f, sin_f, cos_i, sin_i = _dft_mats(n)
    analysis = np.concatenate([cos_f, sin_f], axis=1)             # [n, 2nf]
    synthesis = np.concatenate([cos_i, -sin_i], axis=0)           # [2nf, n]
    return analysis, synthesis


@functools.lru_cache(maxsize=64)
def _dft_mats_packed_jnp(n: int, dtype_name: str):
    """Packed matrices as SHARED jnp constants per (length, dtype): all
    trace sites close over the same objects so each matrix serializes once
    per program (see params/fft.py:_irfft2_mats_jnp)."""
    dt = jnp.dtype(dtype_name)
    with jax.ensure_compile_time_eval():   # concrete even mid-trace
        return tuple(jnp.asarray(m, dt) for m in _dft_mats_packed(n))


def fractional_shift(x: jnp.ndarray, shift: jnp.ndarray, axis: int,
                     compute_dtype=None, n_total: int | None = None,
                     in_offset: int = 0,
                     out_window: tuple | None = None) -> jnp.ndarray:
    """Per-slice fractional translation along `axis` via DFT phase — the
    transform runs as two packed MXU matmuls (see _dft_mats_packed), the
    phase multiply on the VPU.

    x     : [..., N] with `axis` moved last internally
    shift : broadcastable to x.shape without the shifted axis; positive shift
            moves content toward higher indices (out[i] = in[i - shift]).
    compute_dtype: matmul operand dtype (bf16 halves the HBM traffic of the
            [..., 2nf] spectra; accumulation stays fp32).

    Windowed form (exact, not approximate): `n_total` sets the logical DFT
    length when the stored input is only a window of it starting at
    `in_offset` — rows outside the window are zeros, which contribute
    nothing, so the analysis matrix is just sliced.  `out_window=(start,
    size)` slices the synthesis columns so only the rows a later crop
    would keep are ever computed.

    Custom VJP: the op is linear in x with S^T == S_{-shift} (per-frequency
    phase rotations commute with the per-frequency irfft weights; row/col
    windows transpose into each other), so the backward pass is ONE
    forward-equivalent pass of the cotangent at -shift with the windows
    swapped — no cos/sin residuals stored, no replayed dot transposes.
    """
    if n_total is None:
        n_total = jnp.moveaxis(x, axis, -1).shape[-1]
    if out_window is None:
        out_window = (0, n_total)
    dtype_name = jnp.dtype(compute_dtype or jnp.float32).name
    from aphantasia_tpu.ops import pallas_shift
    if pallas_shift.enabled():
        # fused Pallas pass on TPU: spectrum stays in VMEM, phase computed
        # in-register (the XLA path round-trips [..., 2nf] through HBM)
        xm = jnp.moveaxis(x, axis, -1)
        out = pallas_shift.pallas_frac_shift_last(
            xm, shift, dtype_name, n_total, in_offset, tuple(out_window))
        return jnp.moveaxis(out, -1, axis)
    return _frac_shift_vjp(x, shift, axis, dtype_name,
                           n_total, in_offset, out_window)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _frac_shift_vjp(x, shift, axis, dtype_name, n, in_offset, out_window):
    return _frac_shift_impl(x, shift, axis, dtype_name, n_total=n,
                            in_offset=in_offset, out_window=out_window)[0]


def _fs_fwd(x, shift, axis, dtype_name, n, in_offset, out_window):
    out, cs = _frac_shift_impl(x, shift, axis, dtype_name, n_total=n,
                               in_offset=in_offset, out_window=out_window)
    in_size = jnp.moveaxis(x, axis, -1).shape[-1]
    return out, (cs, in_size)  # phase reused in bwd (cos even, sin odd)


def _fs_bwd(axis, dtype_name, n, in_offset, out_window, res, g):
    (c, s), in_size = res
    # the transpose swaps windows: g lives on the fwd OUTPUT window, the
    # cotangent lands back on the fwd INPUT window
    out, _ = _frac_shift_impl(g, None, axis, dtype_name, phase=(c, -s),
                              n_total=n, in_offset=out_window[0],
                              out_window=(in_offset, in_size))
    return (out, jnp.zeros(c.shape[:-1], jnp.float32))


_frac_shift_vjp.defvjp(_fs_fwd, _fs_bwd)


def _frac_shift_impl(x, shift, axis, dtype_name, phase=None, n_total=None,
                     in_offset=0, out_window=None):
    dt = jnp.dtype(dtype_name)
    x = jnp.moveaxis(x, axis, -1)
    n_in = x.shape[-1]
    n = n_total if n_total is not None else n_in
    nf = n // 2 + 1
    analysis, synthesis = _dft_mats_packed_jnp(n, jnp.dtype(dt).name)
    if n_in != n or in_offset:
        analysis = analysis[in_offset:in_offset + n_in]
    if out_window is not None and tuple(out_window) != (0, n):
        synthesis = synthesis[:, out_window[0]:out_window[0] + out_window[1]]
    ndim = x.ndim
    cdims = (((ndim - 1,), (0,)), ((), ()))
    # spectra are emitted in the compute dtype: the [..., 2nf] intermediates
    # are the warp's dominant HBM traffic (~275MB each at 200x336 in f32)
    f = jax.lax.dot_general(x.astype(dt), analysis, cdims,
                            preferred_element_type=dt)            # [..., 2nf]
    fr, fi = f[..., :nf], f[..., nf:]
    if phase is None:
        # cos/sin are ~40-80 VPU ops each on TPU — computed once here and
        # reused by the custom VJP (adjoint phase = conjugate).  (A
        # sign*sqrt(1-cos^2) reconstruction of sin measured cost-neutral.)
        k = jnp.arange(nf, dtype=jnp.float32)
        phi = -2.0 * np.pi * k * shift[..., None] / n
        c, s = jnp.cos(phi).astype(dt), jnp.sin(phi).astype(dt)
    else:
        c, s = phase
    g = jnp.concatenate([fr * c - fi * s, fr * s + fi * c], axis=-1)
    out = jax.lax.dot_general(g, synthesis, cdims,
                              preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, -1, axis), (c, s)


def scale_matrix_1d(scale: jnp.ndarray, offset: jnp.ndarray, n: int,
                    dtype=jnp.float32, n_in: int | None = None,
                    dst0: float = 0.0, src0: float = 0.0) -> jnp.ndarray:
    """Per-sample 1D bilinear resample matrices [S, n, n_in] with
    src = scale * (dst + dst0 - c) + c + offset - src0, c referenced to the
    shared centered frame (c = (max(n+dst0, n_in+src0) - 1)/2 is supplied
    implicitly via dst0/src0 by the caller).  Built with iota comparisons
    (no scatter); out-of-range taps drop, i.e. zero padding outside.

    dst0/src0 express RECTANGULAR matrices: output rows covering only the
    crop window (dst0 = crop offset in padded coords) and/or inputs stored
    unpadded (src0 = pad amount to subtract from padded source coords)."""
    n_in = n if n_in is None else n_in
    dst = jnp.arange(n, dtype=jnp.float32) + dst0
    c = (max(n + 2 * dst0, n_in + 2 * src0) - 1) / 2.0
    src = scale[:, None] * (dst - c) + c + offset[:, None] - src0  # [S,n]
    i0 = jnp.floor(src)
    t = src - i0
    iota = jnp.arange(n_in, dtype=jnp.float32)
    # two taps: i0 (weight 1-t) and i0+1 (weight t); out-of-range taps drop
    m0 = (iota[None, None, :] == i0[:, :, None]).astype(dtype) * (1 - t)[:, :, None].astype(dtype)
    m1 = (iota[None, None, :] == (i0 + 1)[:, :, None]).astype(dtype) * t[:, :, None].astype(dtype)
    return m0 + m1                                                # [S,n,n_in]


def ldu_decompose(a2: jnp.ndarray):
    """Per-sample LDU of [S,2,2] inverse-warp matrices:
    A = [[1,0],[l,1]] @ diag(d1,d2) @ [[1,u],[0,1]].
    Requires a00 != 0 (true for the aug family: |rot| <= 30 deg)."""
    a00, a01 = a2[:, 0, 0], a2[:, 0, 1]
    a10, a11 = a2[:, 1, 0], a2[:, 1, 1]
    d1 = a00
    u = a01 / a00
    l = a10 / a00
    d2 = a11 - a10 * a01 / a00
    return l, d1, d2, u


def _phase_mul(fr, fi, c, s):
    """(fr + i fi) * (c + i s) — the per-frequency rotation both fused-warp
    passes use; the adjoint is the same op at (c, -s)."""
    return fr * c - fi * s, fr * s + fi * c


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_warp(x, my2, mx2, cy, sy, cx, sx, geom, dt_name):
    """The 4-matmul fused LDU warp core (see affine_warp): analysis_H ->
    y-phase -> [synth_H x scale_H] -> [scale_W x analysis_W] -> x-phase ->
    windowed synth_W.  Linear in x; all per-sample matrices/phases are
    PRNG-derived constants, so the VJP is the transposed chain with
    conjugate phases, reusing the saved matrices — no autodiff residuals
    beyond them."""
    out, _ = _fused_warp_impl(x, my2, mx2, cy, sy, cx, sx, geom, dt_name)
    return out


def _fused_warp_impl(x, my2, mx2, cy, sy, cx, sx, geom, dt_name):
    h, w, pad = geom
    dt = jnp.dtype(dt_name)
    nfh = (h + 2 * pad) // 2 + 1
    nfw = (w + 2 * pad) // 2 + 1
    a_h, _ = _dft_mats_packed_jnp(h + 2 * pad, dt_name)
    a_h = a_h[pad:pad + h]                                         # [H,2nfh]
    _, s_w = _dft_mats_packed_jnp(w + 2 * pad, dt_name)
    s_w = s_w[:, pad:pad + w]                                      # [2nfw,W]

    f = jnp.einsum("hk,schw->sckw", a_h, x.astype(dt),
                   preferred_element_type=dt)                      # [S,C,2nfh,W]
    gr, gi = _phase_mul(f[:, :, :nfh], f[:, :, nfh:],
                        cy[:, None], sy[:, None])
    g = jnp.concatenate([gr, gi], axis=2).astype(dt)
    x2 = jnp.einsum("sko,sckw->scow", my2, g,
                    preferred_element_type=dt)                     # [S,C,H,W]
    f2 = jnp.einsum("swk,scow->scok", mx2, x2,
                    preferred_element_type=dt)                     # [S,C,H,2nfw]
    g2r, g2i = _phase_mul(f2[..., :nfw], f2[..., nfw:],
                          cx[:, None], sx[:, None])
    g2 = jnp.concatenate([g2r, g2i], axis=-1).astype(dt)
    out = jnp.einsum("scok,kn->scon", g2, s_w,
                     preferred_element_type=jnp.float32)           # [S,C,H,W]
    return out, (a_h, s_w, nfh, nfw)


def _fused_warp_fwd(x, my2, mx2, cy, sy, cx, sx, geom, dt_name):
    out, _ = _fused_warp_impl(x, my2, mx2, cy, sy, cx, sx, geom, dt_name)
    return out, (my2, mx2, cy, sy, cx, sx)


def _fused_warp_bwd(geom, dt_name, res, dout):
    my2, mx2, cy, sy, cx, sx = res
    h, w, pad = geom
    dt = jnp.dtype(dt_name)
    nfh = (h + 2 * pad) // 2 + 1
    nfw = (w + 2 * pad) // 2 + 1
    a_h, _ = _dft_mats_packed_jnp(h + 2 * pad, dt_name)
    a_h = a_h[pad:pad + h]
    _, s_w = _dft_mats_packed_jnp(w + 2 * pad, dt_name)
    s_w = s_w[:, pad:pad + w]

    dg2 = jnp.einsum("scon,kn->scok", dout.astype(dt), s_w,
                     preferred_element_type=dt)
    dfr, dfi = _phase_mul(dg2[..., :nfw], dg2[..., nfw:],
                          cx[:, None], -sx[:, None])
    df2 = jnp.concatenate([dfr, dfi], axis=-1).astype(dt)
    dx2 = jnp.einsum("swk,scok->scow", mx2, df2,
                     preferred_element_type=dt)
    dg = jnp.einsum("sko,scow->sckw", my2, dx2,
                    preferred_element_type=dt)
    dgr, dgi = _phase_mul(dg[:, :, :nfh], dg[:, :, nfh:],
                          cy[:, None], -sy[:, None])
    df = jnp.concatenate([dgr, dgi], axis=2).astype(dt)
    dx = jnp.einsum("hk,sckw->schw", a_h, df,
                    preferred_element_type=jnp.float32)
    z = lambda a: jnp.zeros_like(a)   # PRNG-derived constants; DCE'd  # noqa: E731
    return dx, z(my2), z(mx2), z(cy), z(sy), z(cx), z(sx)


_fused_warp.defvjp(_fused_warp_fwd, _fused_warp_bwd)


def affine_warp(cuts: jnp.ndarray, affines: jnp.ndarray, pad: int = 64,
                fill: float = 0.0, compute_dtype=None) -> jnp.ndarray:
    """Per-sample affine warp of [S,C,H,W] by inverse maps [S,2,3]
    (src_centered = A2 @ dst_centered + t), gather-free.

    With A2 = L D U, out(x) = in(L D U x + t) is the pass chain
      g1 = warp_L in ;  g2(y) = g1(D y + L^-1 t) ;  out(x) = g2(U x)
    i.e. L (per-column y-shift via DFT phase), D (two per-sample scale
    matmuls whose offsets absorb the full translation L^-1 t), U (per-row
    x-shift) — only 2 FFT shift passes total.

    Fused execution: the L synthesis and the D y-scale collapse into ONE
    per-sample matrix  My2 = synth_Hp . my^T  (freq -> output rows), and
    the D x-scale and the U analysis into  Mx2 = mx^T . anal_Wp  (input
    cols -> freq) — exact linear algebra, 4 big matmuls instead of 6, and
    the two [S,C,>=Hp,W]-sized f32 pass intermediates never exist (they
    were the warp's dominant HBM traffic).  Forming My2/Mx2 costs
    S.2nf.(H.Hp + W.Wp) MACs — a fraction of the applies they eliminate.
    """
    s, c, h, w = cuts.shape
    dt = compute_dtype or jnp.float32
    dt_name = jnp.dtype(dt).name
    hp, wp = h + 2 * pad, w + 2 * pad
    nfh, nfw = hp // 2 + 1, wp // 2 + 1

    a2 = affines[:, :, :2]
    t = affines[:, :, 2]
    l, d1, d2, u = ldu_decompose(a2)

    # centered coordinates of the UNCROPPED rows/cols (identical values in
    # the padded frame — the crop is centered)
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0          # [W]
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0          # [H]

    # L pass phases: src_y = y + l*x  =>  shift = -(l*x) per column
    shift_y = -(l[:, None] * xs[None, :])                          # [S,W]
    ky = jnp.arange(nfh, dtype=jnp.float32)
    phi_y = -2.0 * np.pi * ky[None, :, None] * shift_y[:, None, :] / hp
    cy, sy = jnp.cos(phi_y).astype(dt), jnp.sin(phi_y).astype(dt)  # [S,nfh,W]

    # D pass matrices with translation L^-1 t = (tx, ty - l*tx) as offsets
    my = scale_matrix_1d(d2, t[:, 1] - l * t[:, 0], h, dtype=dt, n_in=hp,
                         dst0=pad)                                 # [S,H,Hp]
    mx = scale_matrix_1d(d1, t[:, 0], wp, dtype=dt, n_in=w,
                         src0=pad)                                 # [S,Wp,W]
    _, synth_h = _dft_mats_packed_jnp(hp, dt_name)                 # [2nfh,Hp]
    a_w, _ = _dft_mats_packed_jnp(wp, dt_name)                     # [Wp,2nfw]
    my2 = jnp.einsum("kh,soh->sko", synth_h, my,
                     preferred_element_type=dt)                    # [S,2nfh,H]
    mx2 = jnp.einsum("svw,vk->swk", mx, a_w,
                     preferred_element_type=dt)                    # [S,W,2nfw]

    # U pass phases: src_x = x + u*y  =>  shift = -(u*y) per row
    shift_x = -(u[:, None] * ys[None, :])                          # [S,H]
    kx = jnp.arange(nfw, dtype=jnp.float32)
    phi_x = -2.0 * np.pi * kx[None, None, :] * shift_x[:, :, None] / wp
    cx, sx = jnp.cos(phi_x).astype(dt), jnp.sin(phi_x).astype(dt)  # [S,H,nfw]

    x = cuts - fill if fill != 0.0 else cuts
    out = _fused_warp(x, my2, mx2, cy, sy, cx, sx, (h, w, pad), dt_name)
    if fill != 0.0:
        out = out + fill
    return out.astype(cuts.dtype)
