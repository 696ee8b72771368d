"""Windowed cutout forward — per-sample 2D-windowed interpolation matmuls.

The dense XLA cutout contraction (ops/sampler._contract) pays the full
[C,H,W] frame per sample although each crop's bicubic taps touch only a
[csize+taps]^2 window (~(csize/H)*(csize/W) of the flops).  r4 measured
the dense formulation to its floor (4.12 ms fwd+bwd at the headline
config, docs/TPU_MEASUREMENTS_r4.md §2) — the remaining lever is not
formulation but FLOPS, and windowing is the only flop cut that preserves
exact semantics.

This kernel computes cut[s] = Wy[s] @ img_window @ Wx[s]^T with:
* the frame PINNED in VMEM across the sample grid (no per-sample frame
  DMA — 720p bf16 is 5.5 MB);
* per-sample 2D dynamic windows: row base 16-aligned (sublane rule),
  col base 128-aligned (lane rule; both probed OK on v5e);
* THREE static window tiers chosen per sample from its drawn crop size
  (the persp kernel's tiering trick — crop sizes are PRNG-drawn before
  the cut, so tiers are exact, never approximate);
* interpolation weights built windowed on the XLA side (tap indices
  rebased to the window origin), wx pre-transposed so the kernel runs
  [C*Kh, Kw] @ [Kw, M] then per-channel [M, Kh] @ [Kh, M] — no in-kernel
  transposes.

The BACKWARD stays the dense XLA path (sampler._contract's custom-VJP
transpose): a windowed backward needs dynamic-window accumulation into a
VMEM-resident [C,H,W] f32 block (~11 MB — over budget with operands) and
the bwd is not the dominant half.  Exactness: identical taps/weights to
the dense path — parity asserted in tests/test_sampler.py.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tier_plan(h: int, w: int, modsize: int):
    """Static (csize_bound, k_h, k_w) tiers for a HxW frame.

    csize ranges over [modsize, min(h,w)] (macro crops near the top).
    Window = csize + 4 bicubic taps + alignment slack (rows floor-16,
    cols floor-128).  Three tiers split the uniform csize draw roughly
    evenly; the top tier is the full-frame fallback."""
    cmax = min(h, w)
    bounds = [int(cmax * f) for f in (0.62, 0.82)] + [cmax]
    plan = []
    for b in bounds:
        k_h = min(_round_up(b + 4 + 15, 16), h)
        k_w = min(_round_up(b + 4 + 127, 128), _round_up(w, 128))
        plan.append((b, k_h, k_w))
    return plan


def _kernel(tier_ref, rb_ref, cb_ref, img_ref, wyw_ref, wxt_ref, out_ref,
            *, plan, m, c, h, w, cdtype):
    s = pl.program_id(0)

    def tier_body(k_h, k_w):
        rb = pl.multiple_of(rb_ref[s], 16)
        cb = pl.multiple_of(cb_ref[s], 128)
        win = img_ref[:, pl.ds(rb, k_h), pl.ds(cb, k_w)]     # [C, Kh, Kw]
        a = win.reshape(c * k_h, k_w).astype(cdtype)
        t1 = jax.lax.dot_general(
            a, wxt_ref[0, :k_w, :].astype(cdtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [C*Kh, M]
        t1 = t1.astype(cdtype).reshape(c, k_h, m)
        wy = wyw_ref[0, :, :k_h].astype(cdtype)              # [M, Kh]
        for ch in range(c):
            out_ref[0, ch] = jax.lax.dot_general(
                wy, t1[ch], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

    for i, (_, k_h, k_w) in enumerate(plan):
        @pl.when(tier_ref[s] == i)
        def _b(k_h=k_h, k_w=k_w):
            tier_body(k_h, k_w)


def windowed_cut_fwd(img, boxes, wyw, wxt, modsize: int,
                     compute_dtype=jnp.bfloat16):
    """img [C,H,W]; boxes (csize, offx, offy) int32 [S]; windowed weights
    wyw [S, M, KHmax] (y-taps rebased to rb) and wxt [S, KWmax, M]
    (x-taps rebased to cb, pre-transposed) -> cuts [S, C, M, M] f32.

    Bases: rb = clip(floor16(offy - 2), 0, h - k_h(tier)),
           cb = clip(floor128(offx - 2), 0, ceil128(w) - k_w(tier)) —
    recomputed here identically to `window_bases` (the weight builder
    must use the same)."""
    c, h, w = img.shape
    s = boxes.csize.shape[0]
    m = modsize
    plan = tier_plan(h, w, m)
    tier, rb, cb = window_bases(boxes, h, w, m)
    kern = functools.partial(_kernel, plan=plan, m=m, c=c, h=h, w=w,
                             cdtype=compute_dtype)
    wp = _round_up(w, 128)
    imgp = img if wp == w else jnp.pad(
        img, ((0, 0), (0, 0), (0, wp - w)))
    kh_max = plan[-1][1]
    kw_max = plan[-1][2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((c, h, wp), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, kh_max), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kw_max, m), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, m, m), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, c, m, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * c * plan[0][1] * plan[0][2] * m,
            bytes_accessed=img.nbytes + wyw.nbytes + wxt.nbytes,
            transcendentals=0),
        interpret=_interpret(),
    )(tier, rb, cb, imgp, wyw, wxt)


def window_bases(boxes, h: int, w: int, modsize: int):
    """Per-sample (tier, rb, cb) int32 arrays for tier_plan(h, w, m)."""
    plan = tier_plan(h, w, modsize)
    cs = boxes.csize
    tier = jnp.zeros_like(cs)
    for i, (b, _, _) in enumerate(plan[:-1]):
        tier = jnp.where(cs > b, i + 1, tier)
    wp = _round_up(w, 128)
    k_h = jnp.asarray([p[1] for p in plan], jnp.int32)[tier]
    k_w = jnp.asarray([p[2] for p in plan], jnp.int32)[tier]
    rb = jnp.clip(((boxes.offy - 2) // 16) * 16, 0,
                  jnp.maximum(h - k_h, 0))
    cb = jnp.clip(((boxes.offx - 2) // 128) * 128, 0,
                  jnp.maximum(wp - k_w, 0))
    return tier, rb, cb
