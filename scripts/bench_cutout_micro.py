"""Microbench: cutout contraction — XLA two-einsum path vs a blocked
VMEM-resident Pallas kernel.

The r3 on-chip trace put the cutout chain at ~4.9 ms/step vs a ~3.8 ms
dense-formulation flop bound (docs/TPU_MEASUREMENTS_r3.md §6); the gap is
dominated by the [S,C,N,H] inter-matmul intermediate's HBM round-trip
(194 MB bf16 at the headline config, written+read in fwd and again in the
VJP).  The candidate kernel processes BS samples per grid step with the
frame pinned in VMEM and the per-sample intermediate never leaving VMEM:

    fwd  per (s,c):  t1 = img[c] @ wx[s]^T   [H,W]@[W,M] -> [H,M]
                     out[s,c] = wy[s] @ t1   [M,H]@[H,M] -> [M,M]
    bwd  per (s,c):  dimg[c] += wy[s]^T @ (g[s,c] @ wx[s])

(wx-first order: 485 vs 541 MFLOP/channel for wy-first at 720p.)  The
interpolation matrices stay on the XLA side (ops/sampler.weight_matrices
— the iota-compare build fuses well there) and stream in as grid blocks.

Unlike the r2 pallas_cutout (per-sample grid, weights built in-kernel,
measured slower), this amortizes grid overhead over BS samples and spends
zero kernel time on the weight build.

Run on the real chip: `python scripts/bench_cutout_micro.py`.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aphantasia_tpu.ops.sampler import CutoutSampler, _contract

H, W, C, S, M = 720, 1280, 3, 200, 224
BS = int(os.environ.get("BS", "2"))   # 4 OOMs scoped vmem by 1.52M (r4)
DT = jnp.bfloat16
OUT_DT = jnp.bfloat16 if os.environ.get("OUT_BF16", "1") == "1" else jnp.float32
CHAIN = int(os.environ.get("CHAIN", "50"))


def timeit(fn, *args, iters=5, warmup=2):
    """Per-call ms via a CHAIN-long dependent loop inside one jit (cf.
    scripts/bench_attn_micro.py — dispatch costs 30-50 ms on the tunnel)."""
    @jax.jit
    def chained(img, *rest):
        def body(c, _):
            o = fn(c, *rest)
            s = o.astype(jnp.float32).sum() * 1e-12
            return c + s.astype(c.dtype), ()
        return jax.lax.scan(body, img, None, length=CHAIN)[0]

    def pull(x):
        return float(jnp.asarray(x.reshape(-1)[0], jnp.float32))

    for _ in range(warmup):
        pull(chained(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3 / CHAIN)


# ------------------------------------------------------------ pallas kernel

def _fwd_kernel(img_ref, wy_ref, wx_ref, out_ref, *, bs, c):
    img = img_ref[...]                         # [C,H,W] VMEM-resident
    for s in range(bs):
        wxt = wx_ref[s].T                      # [W,M] lane/sublane swap
        wy = wy_ref[s]                         # [M,H]
        for ch in range(c):
            t1 = jax.lax.dot_general(img[ch], wxt, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            out_ref[s, ch] = jax.lax.dot_general(
                wy, t1.astype(img.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(g_ref, wy_ref, wx_ref, dimg_ref, *, bs, c):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    for s in range(bs):
        wy = wy_ref[s]                         # [M,H]
        wx = wx_ref[s]                         # [M,W]
        for ch in range(c):
            g = g_ref[s, ch].astype(wy.dtype)  # [M,M]
            # t = g @ wx : [M,W]; dimg[ch] += wy^T @ t : [H,W]
            t = jax.lax.dot_general(g, wx, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            dimg_ref[ch] += jax.lax.dot_general(
                wy, t.astype(wy.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blocked_cut(img, wy, wx, bs):
    out, _ = _blocked_fwd(img, wy, wx, bs)
    return out


def _blocked_fwd(img, wy, wx, bs):
    c, h, w = img.shape
    s, m, _ = wy.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bs=bs, c=c),
        grid=(s // bs,),
        in_specs=[
            pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, m, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, m, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, c, m, m), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, c, m, m), OUT_DT),
    )(img, wy, wx)
    return out, (wy, wx, img.shape)


def _blocked_bwd(bs, res, g):
    wy, wx, img_shape = res
    c, h, w = img_shape
    s, m, _ = wy.shape
    dimg = pl.pallas_call(
        functools.partial(_bwd_kernel, bs=bs, c=c),
        grid=(s // bs,),
        in_specs=[
            pl.BlockSpec((bs, c, m, m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, m, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, m, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
    )(g.astype(DT), wy, wx)
    return dimg.astype(DT), jnp.zeros_like(wy), jnp.zeros_like(wx)


blocked_cut.defvjp(_blocked_fwd, _blocked_bwd)


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (C, H, W), DT)
    sampler = CutoutSampler((H, W), S, M, align="uniform", macro=0.4)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes, dtype=DT)
    wy, wx = jax.device_put(wy), jax.device_put(wx)
    print(f"geometry: S={S} BS={BS} frame {H}x{W} -> {M}x{M}  chain={CHAIN}")

    # --- XLA production path (the two-einsum _contract with custom VJP).
    # NOTE the loss must DEPEND on the output values: grad of .sum() gives
    # a constant-ones cotangent that XLA's algebraic simplifier collapses
    # (the first bwd einsum over g==1 becomes a reduce+broadcast) AND DCEs
    # the fwd — the r4 first run 'measured' fwd+bwd at 0.566 ms that way.
    def l2(o):
        return jnp.sum(o.astype(jnp.float32) ** 2)

    xla_fwd = jax.jit(lambda i, a, b: _contract(i, a, b, "bfloat16"))
    xla_gr = jax.jit(jax.grad(
        lambda i, a, b: l2(_contract(i, a, b, "bfloat16"))))
    print(f"XLA fwd     : {timeit(xla_fwd, img, wy, wx):7.3f} ms")
    print(f"XLA fwd+bwd : {timeit(xla_gr, img, wy, wx):7.3f} ms")

    # --- blocked pallas kernel
    try:
        pf = jax.jit(lambda i, a, b: blocked_cut(i, a, b, BS))
        pg = jax.jit(jax.grad(
            lambda i, a, b: l2(blocked_cut(i, a, b, BS))))
        ref = xla_fwd(img, wy, wx).astype(jnp.float32)
        got = pf(img, wy, wx).astype(jnp.float32)
        dev = float(jnp.abs(ref - got).max())
        print(f"pallas fwd  : {timeit(pf, img, wy, wx):7.3f} ms"
              f"  parity={dev:.2e}")
        gref = xla_gr(img, wy, wx).astype(jnp.float32)
        ggot = pg(img, wy, wx).astype(jnp.float32)
        gdev = float(jnp.abs(gref - ggot).max())
        print(f"pallas f+b  : {timeit(pg, img, wy, wx):7.3f} ms"
              f"  grad parity={gdev:.2e}")
    except Exception as e:
        print(f"pallas blocked: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
