"""Microbench: where does the flat attention core spend its time?

Times attention_core_flat (ops/pallas_attn.py) at the headline ViT-B/32
geometry (t=50, d=768, 12 heads, 200 samples -> R=10000 rows), then ablated
kernel variants to split MXU (score/PV dots) from VPU (exp) from bias-add
cost, plus a block-diagonal batched-dot alternative that only computes the
real 50x50 scores instead of the 8x-overcomputed merged 400x400 block.

Context: r3 on-chip trace showed the attention core ~8.8ms of a 40.5ms
step with bb=8 sample-merged blocks -> 8x waste on exp and score dots.
Run on the real chip: `python scripts/bench_attn_micro.py`.
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

from aphantasia_tpu.ops import pallas_attn as pa

B, T, D, H = 200, 50, 768, 12
HD = D // H
R = B * T
DT = jnp.bfloat16


CHAIN = int(__import__("os").environ.get("CHAIN", "500"))


def timeit(fn, qkv, iters=5, warmup=2):
    """Per-call ms via a CHAIN-long dependent loop inside one jit — each
    iteration's input depends on the previous output, so XLA can neither
    elide nor hoist the kernel, and host dispatch overhead amortizes away."""
    d_in = qkv.shape[-1]

    @jax.jit
    def chained(x):
        def body(c, _):
            o = fn(c)
            # scalar dependency: forces the kernel to run every iteration
            # and perturbs the carry so nothing is loop-invariant
            s = o.astype(jnp.float32).sum() * 1e-9
            return c + s.astype(c.dtype), ()
        return jax.lax.scan(body, x, None, length=CHAIN)[0]

    def pull(x):
        # axon tunnel: block_until_ready returns early; a device->host
        # scalar pull is the only reliable completion barrier (cf. bench.py)
        return float(jnp.asarray(x.reshape(-1)[0], jnp.float32))

    for _ in range(warmup):
        pull(chained(qkv))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(qkv))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3 / CHAIN)


def make_variant(mode):
    """Flat fwd kernel with pieces ablated (mode: full|noexp|dotonly)."""
    def kern(qkv_ref, o_ref, inv_ref, *, bb, n_heads, t):
        n, d3 = qkv_ref.shape
        d = d3 // 3
        hd = d // n_heads
        scale = 1.0 / np.sqrt(hd)
        bias = pa._merged_bias(bb, t, t, False)
        qkv = qkv_ref[...]
        outs, invs = [], []
        for h_i in range(n_heads):
            q = qkv[:, h_i * hd:(h_i + 1) * hd]
            k = qkv[:, d + h_i * hd:d + (h_i + 1) * hd]
            v = qkv[:, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if mode != "dotonly":
                s = s + bias
            if mode == "full":
                e = jnp.exp(jnp.minimum(s, 60.0))
            else:
                e = s
            inv = 1.0 / jnp.sum(e, -1, keepdims=True)
            o = jax.lax.dot_general(e.astype(qkv.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * inv
            outs.append(o.astype(o_ref.dtype))
            invs.append(inv)
        o_ref[...] = jnp.concatenate(outs, axis=-1)
        inv_ref[...] = jnp.concatenate(invs, axis=-1)

    bb = pa.flat_geometry(T, DT)
    block = bb * T

    @jax.jit
    def run(qkv):
        return pl.pallas_call(
            functools.partial(kern, bb=bb, n_heads=H, t=T),
            grid=(R // block,),
            in_specs=[pl.BlockSpec((block, 3 * D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((block, D), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((block, H), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((R, D), DT),
                       jax.ShapeDtypeStruct((R, H), jnp.float32)),
        )(qkv)[0]
    return run


def batched_blockdiag():
    """Alternative: [bb,t,hd] batched dots — scores only 50x50 per sample,
    no cross-sample mask, exp over bb*t*t instead of (bb*t)^2."""
    bb = 8
    block = bb * T

    def kern(qkv_ref, o_ref, inv_ref):
        d = D
        hd = HD
        scale = 1.0 / np.sqrt(hd)
        qkv = qkv_ref[...]                       # [bb, t, 3d]
        outs, invs = [], []
        for h_i in range(H):
            q = qkv[:, :, h_i * hd:(h_i + 1) * hd]
            k = qkv[:, :, d + h_i * hd:d + (h_i + 1) * hd]
            v = qkv[:, :, 2 * d + h_i * hd:2 * d + (h_i + 1) * hd]
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32) * scale
            e = jnp.exp(jnp.minimum(s, 60.0))
            inv = 1.0 / jnp.sum(e, -1, keepdims=True)
            o = jax.lax.dot_general(e.astype(qkv.dtype), v,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32) * inv
            outs.append(o.astype(o_ref.dtype))
            invs.append(inv[..., 0])
        o_ref[...] = jnp.concatenate(outs, axis=-1)
        inv_ref[...] = jnp.stack(invs, axis=-1)

    @jax.jit
    def run(qkv3):                                # [B, t, 3D]
        return pl.pallas_call(
            kern,
            grid=(B // bb,),
            in_specs=[pl.BlockSpec((bb, T, 3 * D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((bb, T, H), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((B, T, D), DT),
                       jax.ShapeDtypeStruct((B, T, H), jnp.float32)),
        )(qkv3)[0]
    return run


def main():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (R, 3 * D), DT)
    print(f"geometry: R={R} t={T} d={D} heads={H} bb={pa.flat_geometry(T, DT)}")

    # production fwd / fwd+bwd
    fwd = jax.jit(lambda x: pa.attention_core_flat(x, H, T))
    print(f"prod fwd            : {timeit(fwd, qkv):7.3f} ms")
    gr = jax.jit(jax.grad(lambda x: pa.attention_core_flat(x, H, T)
                          .astype(jnp.float32).sum()))
    print(f"prod fwd+bwd        : {timeit(gr, qkv):7.3f} ms")

    for mode in ("full", "noexp", "dotonly"):
        try:
            fn = make_variant(mode)
            print(f"fwd variant {mode:8s}: {timeit(fn, qkv):7.3f} ms")
        except Exception as e:
            print(f"fwd variant {mode:8s}: FAIL {type(e).__name__}: {e}")

    qkv3 = qkv.reshape(B, T, 3 * D)               # free: row-major bitcast
    try:
        bd = batched_blockdiag()
        print(f"fwd block-diag batch: {timeit(bd, qkv3):7.3f} ms")
        # parity vs prod
        a = fwd(qkv).astype(jnp.float32)
        b = bd(qkv3).reshape(R, D).astype(jnp.float32)
        print(f"  block-diag parity: max|d|={float(jnp.abs(a - b).max()):.2e}")
    except Exception as e:
        print(f"fwd block-diag batch: FAIL {type(e).__name__}: {e}")

    # padded kernel (t 50->64, merged bb samples of 64 rows) at several bb:
    # bb=2 gives exact [128,128] score tiles at 3.28x overcompute (vs the
    # flat kernel's 8x); includes the per-call pad/unpad HBM cost.
    ref = fwd(qkv).astype(jnp.float32)
    for bb_target in (128, 256, 512):
        orig = pa._geometry
        def geom(t, dtype, _tgt=bb_target):
            tile = pa._tile(dtype)
            t_pad = -(-t // tile) * tile
            return t_pad, max(1, _tgt // t_pad)
        pa._geometry = geom
        try:
            pfwd = jax.jit(lambda x: pa.attention_core(x, H, False, None))
            pgr = jax.jit(jax.grad(lambda x: pa.attention_core(x, H, False, None)
                                   .astype(jnp.float32).sum()))
            t_pad, bb = geom(T, DT)
            tf = timeit(pfwd, qkv3)
            tg = timeit(pgr, qkv3)
            b = pfwd(qkv3).reshape(R, D).astype(jnp.float32)
            dev = float(jnp.abs(ref - b).max())
            print(f"padded bb={bb} n={bb*t_pad:4d} fwd: {tf:7.3f} ms"
                  f"  fwd+bwd: {tg:7.3f} ms  parity={dev:.2e}")
        except Exception as e:
            print(f"padded target={bb_target}: FAIL {type(e).__name__}: {e}")
        finally:
            pa._geometry = orig


if __name__ == "__main__":
    main()
