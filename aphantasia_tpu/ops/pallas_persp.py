"""Exact perspective warp — banded one-hot matmul Pallas TPU kernel.

Closes the one remaining augmentation deviation (VERDICT r1 item 3): the
hot path applied a least-squares affine FIT of the perspective because the
exact 4-tap warp (ops/perspective.py:homography_warp) goes through XLA's
TPU gather (~0.65 s/step fwd, ~3.5 s/step bwd via scatter).  This kernel
computes the exact torchvision bilinear+zeros+fill-mask semantics (see
ops/perspective.py header; reference aphantasia/transforms.py:166) with NO
gather at all:

* Bilinear is the tensor product of two 1px hat functions, so the warp is
  one banded interpolation matmul per axis.  For each 16-row output tile
  the kernel builds the x-weight matrix `Wx[x, p] = relu(1 - |sx(p) - x|)`
  on the fly (iota compare, the cutout sampler's trick, ops/sampler.py)
  and contracts it with a WINDOW of source rows on the MXU:
  `acc[k, p] = sum_x img[yb+k, x] * Wx[x, p]`; the 2-tap y-hat
  `Wy[k, p] = relu(1 - |sy(p) - (yb+k)|)` then reduces the window —
  exactly the 4-tap bilinear, never materializing gathers.
* The window start `yb` comes in per (sample, tile) via scalar prefetch:
  source-y extremes of a projective map over a rectangle sit at the tile
  corners (Mobius in u and v), so the host computes exact per-tile bases
  from 4 corner evaluations.  The window HEIGHT is a compile-time bound of
  the torchvision RandomPerspective(distortion) family: enumerating all
  2^8 extreme corner draws (the max — corner influence is monotone;
  confirmed by a 200k boundary-biased sweep) gives range <= 0.728*h
  forward / 0.243*h inverse at distortion 0.33.
* torchvision applies the perspective only with prob p and returns the
  input UNCHANGED otherwise (RandomPerspective.forward) — the kernel takes
  that Bernoulli as a prefetched per-sample flag and `pl.when`-skips the
  whole tile into a copy, so the expected cost is p * worst-case.

Layouts are chosen so no in-kernel relayout exists: the forward matmul is
[K, X] @ [X, P=16*W] (output pixels on lanes), written to a [S, C, T, P]
result that reshapes back to [S, C, H, W] for free in XLA; the backward
walks the cotangent row window with per-row [C*16, U] @ [U, Qx] matmuls
(input rows on sublanes), accumulating dimg tiles in fp32.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphantasia_tpu.ops.perspective import (_inverse_coeffs, _src_positions,
                                            homography_warp)

_TV = 16            # output rows per grid step (bf16 sublane tile)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def k_fwd(h: int) -> int:
    """Forward source-row window: covers the distortion<=0.33 family's
    per-16-row-tile sy range (max 0.728*h over the 2^8 extreme corner
    draws at h=224) + 2 interp taps + margin."""
    return min(_round_up(int(np.ceil(0.73 * h)) + 6, 16), h)


def k_small(h: int) -> int:
    """Small-tier forward window: ~96% of DRAWN distortion-0.33 samples
    have per-tile range <= 0.35*h (20k-draw measurement at h=224: p95 =
    74 = 0.33*h), so a second pl.when tier at this window cuts the
    expected matmul work ~2.1x; the rare wide draws take the k_fwd tier."""
    return min(_round_up(int(0.36 * h), 16), h)


def k_bwd(h: int, tv: int = _TV) -> int:
    """Backward cotangent-row window: inverse-map row range over a tv-row
    input tile.  The range decomposes as ~tv * slope + cross-u spread:
    extreme-corner enumeration gives tv + 0.19*h at h in {64,224,384} for
    tv in {16,32} (e.g. 72.5 at h=224/tv=32, 41.5 at h=64/tv=32), so
    tv + 0.20*h + margin covers the family with >=6 rows to spare."""
    return min(_round_up(tv + int(np.ceil(0.20 * h)) + 12, 16), h)


def _corner_minmax(coef, h, w, tv, inverse: bool):
    """[S, T] (min, max) over each 16-row tile of the source (or
    inverse-image) y-position, from the 4 tile-corner evaluations (exact:
    the map is Mobius, hence monotone, in u and in v separately)."""
    t_tiles = h // tv
    us = jnp.asarray([0.5, w - 0.5], jnp.float32)                 # [2]
    v0 = jnp.arange(t_tiles, dtype=jnp.float32) * tv
    vs = jnp.stack([v0 + 0.5, v0 + tv - 0.5], -1)                 # [T,2]
    uu = jnp.broadcast_to(us[None, None, :], (t_tiles, 2, 2))
    vv = jnp.broadcast_to(vs[:, :, None], (t_tiles, 2, 2))
    if inverse:
        inv = _inverse_coeffs(coef)                               # [S,3,3]
        den = (inv[:, 2, 0, None, None, None] * uu
               + inv[:, 2, 1, None, None, None] * vv
               + inv[:, 2, 2, None, None, None])
        sy = (inv[:, 1, 0, None, None, None] * uu
              + inv[:, 1, 1, None, None, None] * vv
              + inv[:, 1, 2, None, None, None]) / den - 0.5
    else:
        _, sy = _src_positions(coef, uu.reshape(1, t_tiles, 4),
                               vv.reshape(1, t_tiles, 4))         # [S,T,4]
    sy = sy.reshape(coef.shape[0], t_tiles, 4)
    return sy.min(-1), sy.max(-1)                                 # [S,T] x2


def _bases(coef, h, w, tv, k, inverse, margin):
    mn, _ = _corner_minmax(coef, h, w, tv, inverse)
    yb = jnp.floor(mn).astype(jnp.int32) - margin
    return jnp.clip(yb, 0, max(h - k, 0))


def _fwd_bases_tiered(coef, flags, h, w, tv, k1, k2):
    """Refine the 0/1 Bernoulli flags into window tiers (1 = small k1,
    2 = full k2) from the EXACT per-sample tile ranges, and clamp the
    per-tile window bases to the tier's window size."""
    mn, mx = _corner_minmax(coef, h, w, tv, inverse=False)
    rng = (mx - mn).max(-1)                                       # [S]
    tier = jnp.where(rng + 4.0 <= k1, 1, 2).astype(jnp.int32)
    flags = flags * tier
    kcap = jnp.where(flags == 1, max(h - k1, 0),
                     max(h - k2, 0)).astype(jnp.int32)            # [S]
    yb = jnp.floor(mn).astype(jnp.int32) - 1
    return flags, jnp.clip(yb, 0, kcap[:, None])


def _rational(coef_ref, uu, vv):
    """Source positions on iota grids (all elementwise, broadcasting)."""
    a, b, c0 = coef_ref[0, 0], coef_ref[0, 1], coef_ref[0, 2]
    d, e, f = coef_ref[0, 3], coef_ref[0, 4], coef_ref[0, 5]
    g, hh = coef_ref[0, 6], coef_ref[0, 7]
    den = g * uu + hh * vv + 1.0
    sx = (a * uu + b * vv + c0) / den - 0.5
    sy = (d * uu + e * vv + f) / den - 0.5
    return sx, sy


def _tap_sum(s, n):
    """Analytic zeros-padding tap-weight sum of a 1D bilinear sample at
    position `s` over the lattice [0, n): (1-t)*in(y0) + t*in(y0+1)."""
    y0 = jnp.floor(s)
    t = s - y0
    in0 = ((y0 >= 0) & (y0 <= n - 1)).astype(s.dtype)
    in1 = ((y0 + 1 >= 0) & (y0 + 1 <= n - 1)).astype(s.dtype)
    return (1.0 - t) * in0 + t * in1


def _fwd_kernel(flags_ref, ybase_ref, coef_ref, img_ref, imgflat_ref,
                out_ref, *, tv, k1, k2, h, w, c, cdtype):
    s = pl.program_id(0)
    t = pl.program_id(1)
    p = tv * w

    @pl.when(flags_ref[s] == 0)
    def _copy():
        out_ref[0, :, 0, :] = imgflat_ref[0, :, 0, :]

    def _warp_body(k, merge_c):
        yb = ybase_ref[s, t]
        # output-pixel lane grid: p = dv*w + u
        pi = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        uu = (pi % w).astype(jnp.float32) + 0.5
        vv = (pi // w).astype(jnp.float32) + (t * tv) + 0.5
        sx, sy = _rational(coef_ref, uu, vv)                     # [1, P]
        xi = jax.lax.broadcasted_iota(jnp.float32, (w, p), 0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - xi))            # [X, P]
        ki = (jax.lax.broadcasted_iota(jnp.float32, (k, p), 0)
              + yb.astype(jnp.float32))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - ki))            # [K, P]
        mask = _tap_sum(sx, w) * _tap_sum(sy, h)                 # [1, P]
        wx = wx.astype(cdtype)
        if merge_c:
            # one [C*K, X] @ [X, P] — merging channels into M nearly
            # saturates the MXU row tiles (3*80=240 of 256 vs 80 of 128)
            bwin = img_ref[0, :, pl.ds(yb, k), :].reshape(c * k, w)
            acc = jax.lax.dot_general(
                bwin.astype(cdtype), wx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [C*K, P]
            val = jnp.sum(acc.reshape(c, k, p) * wy[None], axis=1)
            out_ref[0, :, 0, :] = (val * mask).astype(out_ref.dtype)
        else:
            for ci in range(c):
                bwin = img_ref[0, ci, pl.ds(yb, k), :]           # [K, X]
                acc = jax.lax.dot_general(
                    bwin.astype(cdtype), wx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [K, P]
                val = jnp.sum(acc * wy, axis=0, keepdims=True)   # [1, P]
                out_ref[0, ci, 0, :] = (val * mask)[0].astype(out_ref.dtype)

    # tier-2 (extreme draws, rare) stays per-channel: its merged fp32
    # accumulator [3*k2, P] would push VMEM toward the 16MB ceiling
    if k1 == k2:
        @pl.when(flags_ref[s] != 0)
        def _w():
            _warp_body(k2, merge_c=False)
    else:
        @pl.when(flags_ref[s] == 1)
        def _w1():
            _warp_body(k1, merge_c=True)

        @pl.when(flags_ref[s] == 2)
        def _w2():
            _warp_body(k2, merge_c=False)


def _bwd_kernel(flags_ref, pbase_ref, coef_ref, g_ref, out_ref, *,
                tv, kb, h, w, c, cdtype):
    s = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(flags_ref[s] == 0)
    def _copy():
        out_ref[0] = g_ref[0, :, pl.ds(t * tv, tv), :]

    @pl.when(flags_ref[s] != 0)
    def _warp():
        pb = pbase_ref[s, t]
        qxi = jax.lax.broadcasted_iota(jnp.float32, (w, w), 1)   # lanes=qx
        ul_i = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)    # lanes=u
        uu_l = ul_i.astype(jnp.float32) + 0.5                    # [1, W]
        uc_i = jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0)  # sub=u
        yt = (jax.lax.broadcasted_iota(jnp.float32, (tv, w), 0)
              + t * tv)                                          # input row y

        def body(jj, acc):
            j = (pb + jj).astype(jnp.float32)
            # lane-oriented positions at output row j (for mask / wy)
            sx_l, sy_l = _rational(coef_ref, uu_l, j + 0.5)      # [1, W]
            maskj = _tap_sum(sx_l, w) * _tap_sum(sy_l, h)        # [1, W]
            # input rows of this tile tapped by output row j
            wyj = jnp.maximum(0.0, 1.0 - jnp.abs(sy_l - yt))     # [Tv, W]
            grow = g_ref[0, :, pl.ds(pb + jj, 1), :]             # [C,1,W]
            gm = grow.reshape(c, w).astype(jnp.float32) * maskj  # [C, W]
            a = (gm[:, None, :] * wyj[None]).reshape(c * tv, w)  # [CT, U]
            # sublane-oriented x weights: wxq[u, qx]
            sx_c, _ = _rational(coef_ref, uc_i + 0.5, j + 0.5)   # [U, 1]
            wxq = jnp.maximum(0.0, 1.0 - jnp.abs(sx_c - qxi))    # [U, Qx]
            return acc + jax.lax.dot_general(
                a.astype(cdtype), wxq.astype(cdtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [CT, Qx]

        acc = jax.lax.fori_loop(
            0, kb, body, jnp.zeros((c * tv, w), jnp.float32))
        out_ref[0] = acc.reshape(c, tv, w).astype(out_ref.dtype)


def _prep(img, coef, flags):
    s, c, h, w = img.shape
    coef = coef.astype(jnp.float32)
    if flags is None:
        ident = jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32)
        flags = (jnp.abs(coef - ident) > 1e-5).any(-1)
    return coef, flags.astype(jnp.int32)


def _fwd_call(img, coef, flags):
    s, c, h, w = img.shape
    tv, k1, k2 = _TV, k_small(h), k_fwd(h)
    t_tiles = h // tv
    flags, ybase = _fwd_bases_tiered(coef, flags, h, w, tv, k1, k2)
    imgflat = img.reshape(s, c, t_tiles, tv * w)
    kern = functools.partial(_fwd_kernel, tv=tv, k1=k1, k2=k2, h=h, w=w,
                             c=c, cdtype=img.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, t_tiles),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, t, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i, t, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1, tv * w), lambda i, t, *_: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 1, tv * w),
                               lambda i, t, *_: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, c, t_tiles, tv * w), img.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * c * k1 * w * tv * w * t_tiles,
            bytes_accessed=img.nbytes * 3,
            transcendentals=0),
        interpret=_interpret(),
    )(flags, ybase, coef, img, imgflat)
    return out.reshape(s, c, h, w)


def _bwd_call(g, coef, flags):
    s, c, h, w = g.shape
    # wider input tiles double the matmul's M (= c*tv rows) for better MXU
    # utilization; the window grows only ~1.2x (k_bwd), a clear net win
    tv = 32 if h % 32 == 0 else _TV
    kb = k_bwd(h, tv)
    t_tiles = h // tv
    pbase = _bases(coef, h, w, tv, kb, inverse=True, margin=3)
    kern = functools.partial(_bwd_kernel, tv=tv, kb=kb, h=h, w=w, c=c,
                             cdtype=g.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, t_tiles),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, t, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i, t, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, c, h, w), g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * c * tv * w * w * kb * t_tiles,
            bytes_accessed=g.nbytes * 3,
            transcendentals=0),
        interpret=_interpret(),
    )(flags, pbase, coef, g)


@functools.lru_cache(maxsize=None)
def kernel_supported(backend: str = None) -> bool:
    """One-time build-time probe: compile + run a tiny fwd/bwd instance on
    the current backend.  Mosaic support for this kernel's constructs
    (scalar prefetch, dynamic sublane windows) has to be proven on the
    real chip; on failure the augmentation pipeline falls back LOUDLY to
    the r1 affine-fit path instead of taking down the whole program
    (ops/augs.py:get_transform).  Keyed per backend; call OUTSIDE jit."""
    backend = backend or jax.default_backend()
    try:
        img = jnp.zeros((3, 1, 2 * _TV, 8), jnp.float32)
        # sample 0: y-scale 2 -> wide tile range (k_fwd tier); sample 1:
        # small translate (k_small tier); sample 2: identity copy branch
        coef = jnp.asarray([[1, 0, 0, 0, 2, 0, 0, 0],
                            [1, 0, 2, 0, 1, 1, 0, 0],
                            [1, 0, 0, 0, 1, 0, 0, 0]], jnp.float32)
        flags = jnp.asarray([1, 1, 0], jnp.int32)

        def f(x):
            return jnp.sum(_persp_core(x, coef, flags) ** 2)

        jax.block_until_ready(jax.value_and_grad(f)(img))
        return True
    except Exception as e:  # pragma: no cover - hardware-dependent
        print("!!" + "!" * 72)
        print(f"!! pallas_persp kernel unsupported on backend {backend!r}:")
        print(f"!!   {e!r}"[:200])
        print("!! transforms_fast falls back to the affine-fit perspective "
              "(r1 path).")
        print("!!" + "!" * 72)
        return False


def perspective_warp(img, coef, flags=None):
    """Exact torchvision perspective of [S,C,H,W] by [S,8] coeffs.

    Semantics == ops/perspective.py:homography_warp (bilinear, zeros
    padding, fill-0 mask; torch-golden in tests/test_perspective.py), but
    gather-free and O(p * banded-window) expected cost.  `flags` is the
    per-sample apply mask (torchvision RandomPerspective returns the input
    UNCHANGED when the Bernoulli fails — flag 0 copies exactly); derived
    from non-identity coeffs when omitted.  Coefficients must come from
    the distortion<=0.33 family the window bound covers (k_fwd/k_bwd
    above); H must be a multiple of 16 (CLIP input sizes are) — anything
    else falls back to the XLA gather op."""
    if img.shape[2] % _TV:
        return homography_warp(img, coef)
    coef, flags = _prep(img, coef, flags)
    return _persp_core(img, coef, flags)


@jax.custom_vjp
def _persp_core(img, coef, flags):
    return _fwd_call(img, coef, flags)


def _core_fwd(img, coef, flags):
    return _fwd_call(img, coef, flags), (coef, flags)


def _core_bwd(res, g):
    coef, flags = res
    return (_bwd_call(g, coef, flags), jnp.zeros_like(coef),
            np.zeros(flags.shape, jax.dtypes.float0))


_persp_core.defvjp(_core_fwd, _core_bwd)
