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

Layouts are chosen so no in-kernel relayout exists and every dynamic
sublane window is 16-aligned (Mosaic requires provably tile-aligned
dynamic indices in the second-minor dim — bases are floored to 16 and
annotated `pl.multiple_of`; windows carry +16 slack): the forward runs
one [C*K, X] @ [X, W] matmul per output row (channels merged into M;
output row written straight into the natural [C, tv, W] tile), and the
backward walks the cotangent row window in aligned 16-row chunks with a
static in-chunk unroll of per-row [C*tv, U] @ [U, Qx] matmuls,
accumulating dimg tiles in fp32.
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


def _dot_precision(cdtype):
    """HIGHEST only for f32 operands: the TPU default truncates f32 matmul
    inputs to bf16 (measured 1e-2 deviation at identity), but Mosaic
    REJECTS an fp32 contract precision on bf16 operands ("Bad lhs type"
    on v5e) — and bf16 inputs have nothing left to truncate."""
    return (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def k_fwd(h: int) -> int:
    """Forward source-row window: covers the distortion<=0.33 family's
    per-16-row-tile sy range (max 0.728*h over the 2^8 extreme corner
    draws at h=224) + 2 interp taps + margin + 16 alignment slack (the
    window base is floored to a multiple of 16 for Mosaic)."""
    return min(_round_up(int(np.ceil(0.73 * h)) + 22, 16), h)


def k_small(h: int) -> int:
    """Small-tier forward window: ~96% of DRAWN distortion-0.33 samples
    have per-tile range <= 0.35*h (20k-draw measurement at h=224: p95 =
    74 = 0.33*h), so a second pl.when tier at this window cuts the
    expected matmul work ~1.7x; the rare wide draws take the k_fwd tier.
    +16 covers the 16-aligned window base."""
    return min(_round_up(int(0.36 * h) + 16, 16), h)


def k_bwd(h: int, tv: int = _TV) -> int:
    """Backward cotangent-row window: inverse-map row range over a tv-row
    input tile.  The range decomposes as ~tv * slope + cross-u spread:
    extreme-corner enumeration gives tv + 0.19*h at h in {64,224,384} for
    tv in {16,32} (e.g. 72.5 at h=224/tv=32, 41.5 at h=64/tv=32), so
    tv + 0.20*h + margin covers the family with >=6 rows to spare; +16
    covers the 16-aligned window base."""
    return min(_round_up(tv + int(np.ceil(0.20 * h)) + 28, 16), h)


def k_rot_fwd(h: int, w: int) -> int:
    """Forward window for the ±30° rotation family (torchvision
    random_rotate_fast, reference transforms.py:73-84): per-tile source-y
    range = sin|θ|·w + cos θ·tv ≤ 0.5·w + 0.87·16."""
    return min(_round_up(int(0.5 * w + 0.87 * _TV) + 22, 16), h)


def k_rot_small(h: int, w: int) -> int:
    """Small rotation tier: |θ| ≤ ~15° (half the nonzero draws of the
    uniform ±30° menu) has range ≤ 0.26·w + tv; the tier split itself is
    EXACT per sample (corner min/max in _fwd_bases_tiered)."""
    return min(_round_up(int(0.26 * w + _TV) + 22, 16), h)


def k_rot_bwd(h: int, w: int, tv: int) -> int:
    """Backward window for rotation: the inverse map is the rotation by
    -θ — same range formula over a tv-row input tile."""
    return min(_round_up(tv + int(0.5 * w + 0.87 * tv) + 28, 16), h)


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
    yb = (yb // 16) * 16        # Mosaic: dynamic sublane windows 16-aligned
    return jnp.clip(yb, 0, max(h - k, 0))


def _fwd_bases_tiered(coef, flags, h, w, tv, k1, k2):
    """Refine the 0/1 Bernoulli flags into window tiers (1 = small k1,
    2 = full k2) from the EXACT per-sample tile ranges, and clamp the
    per-tile window bases to the tier's window size."""
    mn, mx = _corner_minmax(coef, h, w, tv, inverse=False)
    rng = (mx - mn).max(-1)                                       # [S]
    tier = jnp.where(rng + 20.0 <= k1, 1, 2).astype(jnp.int32)
    flags = flags * tier
    kcap = jnp.where(flags == 1, max(h - k1, 0),
                     max(h - k2, 0)).astype(jnp.int32)            # [S]
    yb = jnp.floor(mn).astype(jnp.int32) - 1
    yb = (yb // 16) * 16        # Mosaic: dynamic sublane windows 16-aligned
    return flags, jnp.clip(yb, 0, kcap[:, None])


def _rational(cf, uu, vv):
    """Source positions on iota grids (all elementwise, broadcasting).
    `cf` is the 8-tuple of per-sample scalars read from SMEM once."""
    a, b, c0, d, e, f, g, hh = cf
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


def _fwd_kernel(flags_ref, ybase_ref, coef_ref, img_ref, imgtile_ref,
                out_ref, *, tv, k1, k2, h, w, c, cdtype):
    s = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(flags_ref[s] == 0)
    def _copy():
        # block-indexed tile (the index map slices): in-kernel pl.ds at a
        # grid-symbol offset misreads under Mosaic (measured on v5e)
        out_ref[0] = imgtile_ref[0]

    def _warp_body(k):
        yb = pl.multiple_of(ybase_ref[s, t], 16)
        cf = tuple(coef_ref[s, i] for i in range(8))
        bwin = img_ref[0, :, pl.ds(yb, k), :]                    # [C, K, X]
        bflat = bwin.reshape(c * k, w).astype(cdtype)            # [C*K, X]
        ybf = ybase_ref[s, t].astype(jnp.float32)
        ul = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
              .astype(jnp.float32) + 0.5)                        # [1, W]
        xi = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(
            jnp.float32)                                         # [X, W]
        ki = (jax.lax.broadcasted_iota(jnp.int32, (k, w), 0).astype(
            jnp.float32) + ybf)                                  # [K, W]
        for r in range(tv):
            vv = jnp.float32(0.5) + (t * tv + r)
            sx, sy = _rational(cf, ul, vv)                       # [1, W]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - xi))        # [X, W]
            # channels merged into M: [C*K, X] @ [X, W] on the MXU
            acc = jax.lax.dot_general(
                bflat, wx.astype(cdtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(cdtype))                # [C*K, W]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - ki))        # [K, W]
            val = jnp.sum(acc.reshape(c, k, w) * wy[None], axis=1)
            mask = _tap_sum(sx, w) * _tap_sum(sy, h)             # [1, W]
            out_ref[0, :, r, :] = (val * mask).astype(out_ref.dtype)

    if k1 == k2:
        @pl.when(flags_ref[s] != 0)
        def _w():
            _warp_body(k2)
    else:
        @pl.when(flags_ref[s] == 1)
        def _w1():
            _warp_body(k1)

        @pl.when(flags_ref[s] == 2)
        def _w2():
            _warp_body(k2)


def _bwd_kernel(flags_ref, pbase_ref, coef_ref, g_ref, gtile_ref,
                out_ref, *, tv, kb, h, w, c, cdtype):
    s = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(flags_ref[s] == 0)
    def _copy():
        out_ref[0] = gtile_ref[0]

    @pl.when(flags_ref[s] != 0)
    def _warp():
        pb = pbase_ref[s, t]
        cf = tuple(coef_ref[s, i] for i in range(8))
        qxi = jax.lax.broadcasted_iota(
            jnp.int32, (w, w), 1).astype(jnp.float32)            # lanes=qx
        ul_i = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)    # lanes=u
        uu_l = ul_i.astype(jnp.float32) + 0.5                    # [1, W]
        uc_i = jax.lax.broadcasted_iota(
            jnp.int32, (w, 1), 0).astype(jnp.float32)            # sub=u
        yt = (jax.lax.broadcasted_iota(jnp.int32, (tv, w), 0).astype(
            jnp.float32) + t * tv)                               # input row y

        def chunk(ci, acc):
            # aligned 16-row cotangent chunk; rows unrolled statically
            base = pl.multiple_of(pb + ci * 16, 16)
            gblk = g_ref[0, :, pl.ds(base, 16), :]               # [C, 16, W]
            for r in range(16):
                j = (pb + ci * 16 + r).astype(jnp.float32)
                # lane-oriented positions at output row j (for mask / wy)
                sx_l, sy_l = _rational(cf, uu_l, j + 0.5)        # [1, W]
                maskj = _tap_sum(sx_l, w) * _tap_sum(sy_l, h)    # [1, W]
                # input rows of this tile tapped by output row j
                wyj = jnp.maximum(0.0, 1.0 - jnp.abs(sy_l - yt))  # [Tv, W]
                gm = gblk[:, r, :].astype(jnp.float32) * maskj   # [C, W]
                a = (gm[:, None, :] * wyj[None]).reshape(c * tv, w)
                # sublane-oriented x weights: wxq[u, qx]
                sx_c, _ = _rational(cf, uc_i + 0.5, j + 0.5)     # [U, 1]
                wxq = jnp.maximum(0.0, 1.0 - jnp.abs(sx_c - qxi))
                acc = acc + jax.lax.dot_general(
                    a.astype(cdtype), wxq.astype(cdtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(cdtype))            # [CT, Qx]
            return acc

        acc = jax.lax.fori_loop(
            0, kb // 16, chunk, jnp.zeros((c * tv, w), jnp.float32))
        out_ref[0] = acc.reshape(c, tv, w).astype(out_ref.dtype)


def _prep(img, coef, flags):
    s, c, h, w = img.shape
    coef = coef.astype(jnp.float32)
    if flags is None:
        ident = jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32)
        flags = (jnp.abs(coef - ident) > 1e-5).any(-1)
    return coef, flags.astype(jnp.int32)


def _fwd_call(img, coef, flags, family="persp"):
    s, c, h, w = img.shape
    tv = _TV
    if family == "rotate":
        k1, k2 = k_rot_small(h, w), k_rot_fwd(h, w)
    else:
        k1, k2 = k_small(h), k_fwd(h)
    t_tiles = h // tv
    flags, ybase = _fwd_bases_tiered(coef, flags, h, w, tv, k1, k2)
    kern = functools.partial(_fwd_kernel, tv=tv, k1=k1, k2=k2, h=h, w=w,
                             c=c, cdtype=img.dtype)
    # Mosaic tiling: a block's last two dims must be (sublane,lane)-tile
    # aligned or full — coef rides SMEM as the FULL [S, 8] array (rows
    # picked by program_id in the kernel); the out block is the natural
    # [1, C, tv, W] tile so every write is static in the sublane dim.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, t_tiles),
        in_specs=[
            pl.BlockSpec((s, 8), lambda i, t, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i, t, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, c, h, w), img.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * c * k1 * w * tv * w * t_tiles,
            bytes_accessed=img.nbytes * 3,
            transcendentals=0),
        interpret=_interpret(),
    )(flags, ybase, coef, img, img)


def _bwd_call(g, coef, flags, family="persp"):
    s, c, h, w = g.shape
    # wider input tiles double the matmul's M (= c*tv rows) for better MXU
    # utilization; the window grows only ~1.2x (k_bwd), a clear net win
    tv = 32 if h % 32 == 0 else _TV
    kb = k_rot_bwd(h, w, tv) if family == "rotate" else k_bwd(h, tv)
    t_tiles = h // tv
    pbase = _bases(coef, h, w, tv, kb, inverse=True, margin=3)
    kern = functools.partial(_bwd_kernel, tv=tv, kb=kb, h=h, w=w, c=c,
                             cdtype=g.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, t_tiles),
        in_specs=[
            pl.BlockSpec((s, 8), lambda i, t, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i, t, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
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
    )(flags, pbase, coef, g, g)


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
            return jnp.sum(_persp_core("persp", x, coef, flags) ** 2)

        jax.block_until_ready(jax.value_and_grad(f)(img))
        # the production step runs bf16 — Mosaic's dtype/precision checks
        # differ per operand type, so probe that path too (fwd + VJP)
        gb = jax.grad(lambda x: jnp.sum(
            _persp_core("persp", x, coef, flags).astype(jnp.float32) ** 2))(
                img.astype(jnp.bfloat16))
        jax.block_until_ready(gb)
        return True
    except Exception as e:  # pragma: no cover - hardware-dependent
        print("!!" + "!" * 72)
        print(f"!! pallas_persp kernel unsupported on backend {backend!r}:")
        print(f"!!   {e!r}"[:200])
        print("!! transforms_fast falls back to the affine-fit perspective "
              "(r1 path).")
        print("!!" + "!" * 72)
        return False


def perspective_warp(img, coef, flags=None, family="persp"):
    """Exact torchvision homography of [S,C,H,W] by [S,8] coeffs.

    Semantics == ops/perspective.py:homography_warp (bilinear, zeros
    padding, fill-0 mask; torch-golden in tests/test_perspective.py), but
    gather-free and O(p * banded-window) expected cost.  `flags` is the
    per-sample apply mask (torchvision RandomPerspective returns the input
    UNCHANGED when the Bernoulli fails — flag 0 copies exactly); derived
    from non-identity coeffs when omitted.  `family` selects the static
    window bounds the coefficients must come from: "persp" = the
    RandomPerspective distortion<=0.33 family (k_fwd/k_bwd), "rotate" =
    torchvision F.affine rotations |θ|<=30° (k_rot_* — the fully-exact
    opt-in pipeline routes its rotate stage here).  H must be a multiple
    of 16 (CLIP input sizes are) — anything else falls back to the XLA
    gather op."""
    if img.shape[2] % _TV:
        return homography_warp(img, coef)
    coef, flags = _prep(img, coef, flags)
    return _persp_core(family, img, coef, flags)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _persp_core(family, img, coef, flags):
    return _fwd_call(img, coef, flags, family)


def _core_fwd(family, img, coef, flags):
    return _fwd_call(img, coef, flags, family), (coef, flags)


def _core_bwd(family, res, g):
    coef, flags = res
    return (_bwd_call(g, coef, flags, family), jnp.zeros_like(coef),
            np.zeros(flags.shape, jax.dtypes.float0))


_persp_core.defvjp(_core_fwd, _core_bwd)
