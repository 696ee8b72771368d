"""Diagnostic: is the attention kernel bound by LAYOUT ops?

bench_attn_micro.py showed the flat attention kernel's time is invariant to
flops (8x vs 3.3x overcompute: same) and to exp (dotonly == full). Remaining
suspects: per-head lane slices at 64-column offsets (half a lane tile ->
relayout) and the implicit k/p transposes inside dot_general.

Variants (timing-only, same useful math shape as one fwd layer):
  prod      — production flat kernel (baseline)
  headmajor — inputs pre-structured [H, n, hd] q / [H, hd, n] kT / [H, n, hd] v:
              leading-dim indexing (no slice relayout), kT pre-transposed
              (no in-kernel transpose)
  headmajor_noT — same but k as [H, n, hd] with contract (1,1)
              (isolates the transpose cost from the slice cost)
  hd128     — single fused input, 6 heads of hd=128 (lane-tile-ALIGNED
              slices; isolates slice-alignment cost)
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
BB = pa.flat_geometry(T, DT)
N = BB * T           # 400
NBLK = R // N        # 25
CHAIN = int(__import__("os").environ.get("CHAIN", "500"))


def timeit(fn, *args, iters=5, warmup=2):
    @jax.jit
    def chained(*xs):
        def body(c, _):
            o = fn(*c[:len(xs)])
            s = o.astype(jnp.float32).sum() * 1e-9
            return tuple(x + s.astype(x.dtype) for x in c), ()
        return jax.lax.scan(body, tuple(xs), None, length=CHAIN)[0][0]

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


def prod():
    return jax.jit(lambda x: pa.attention_core_flat(x, H, T))


def headmajor(transposed_k: bool):
    NP = 512       # kT block's key dim padded 400->512 (128-divisible)

    def kern(q_ref, k_ref, v_ref, o_ref):
        bias = pa._merged_bias(BB, T, T, False)
        scale = 1.0 / np.sqrt(HD)
        for h in range(H):
            q = q_ref[h]                      # [N, hd], leading index
            v = v_ref[h]
            if transposed_k:
                kt = k_ref[h][:, :N]          # [hd, N] from padded [hd, NP]
                s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                k = k_ref[h]                  # [N, hd]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            s = s * scale + bias
            e = jnp.exp(jnp.minimum(s, 60.0))
            inv = 1.0 / jnp.sum(e, -1, keepdims=True)
            o = jax.lax.dot_general(e.astype(q.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * inv
            o_ref[h] = o.astype(o_ref.dtype)

    kshape = (NBLK * H, HD, NP) if transposed_k else (H, R, HD)
    kblk = (H, HD, NP) if transposed_k else (H, N, HD)
    kmap = (lambda i: (i, 0, 0)) if transposed_k else (lambda i: (0, i, 0))

    @jax.jit
    def run(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec((H, N, HD), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(kblk, kmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, N, HD), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((H, N, HD), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, R, HD), DT),
        )(q, k, v)
    return run, kshape


def hd128():
    """Fused qkv but 6 heads x 128 — every slice offset lane-tile aligned."""
    H6, HD128 = 6, 128

    def kern(qkv_ref, o_ref):
        bias = pa._merged_bias(BB, T, T, False)
        scale = 1.0 / np.sqrt(HD128)
        qkv = qkv_ref[...]
        outs = []
        for h in range(H6):
            q = qkv[:, h * HD128:(h + 1) * HD128]
            k = qkv[:, D + h * HD128:D + (h + 1) * HD128]
            v = qkv[:, 2 * D + h * HD128:2 * D + (h + 1) * HD128]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias
            e = jnp.exp(jnp.minimum(s, 60.0))
            inv = 1.0 / jnp.sum(e, -1, keepdims=True)
            o = jax.lax.dot_general(e.astype(qkv.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * inv
            outs.append(o.astype(o_ref.dtype))
        o_ref[...] = jnp.concatenate(outs, axis=-1)

    @jax.jit
    def run(qkv):
        return pl.pallas_call(
            kern,
            grid=(NBLK,),
            in_specs=[pl.BlockSpec((N, 3 * D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, D), DT),
        )(qkv)
    return run


def main():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (R, 3 * D), DT)
    print(f"R={R} t={T} bb={BB} block={N} x {NBLK} blocks, {H} heads x {HD}")
    print(f"prod flat           : {timeit(prod(), qkv):7.3f} ms")

    q = jax.random.normal(key, (H, R, HD), DT)
    v = jax.random.normal(key, (H, R, HD), DT)
    run, kshape = headmajor(True)
    kt = jax.random.normal(key, kshape, DT)
    print(f"headmajor kT        : {timeit(run, q, kt, v):7.3f} ms")
    run2, kshape2 = headmajor(False)
    k = jax.random.normal(key, kshape2, DT)
    print(f"headmajor k (1,1)   : {timeit(run2, q, k, v):7.3f} ms")
    print(f"hd128 aligned slices: {timeit(hd128(), qkv):7.3f} ms")


if __name__ == "__main__":
    main()
