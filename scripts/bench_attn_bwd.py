"""Ablate the flat-attention BACKWARD kernel to find its cost structure.

The r3 trace: attn bwd custom-calls = 6.6 ms/step (12 x 0.55 ms), ~28% MFU
vs the MLP bwd fusions' 73%+.  Per head the bwd does 5 dots (s-recompute,
dv, dp, dq, dk), an exp, and a ds = p*(dp - rowsum(dp*p)) f32 VPU chain.
Variants isolate each piece (timing-only, junk math where marked):

  full      — production _bwd_kernel_flat
  nodsum    — ds = p32 * dp (drops the rowsum reduction)           [junk]
  noexp     — p32 = s * inv (drops exp; keeps all dots)            [junk]
  nos       — p fed as an extra input (drops the s-recompute dot
              AND the exp; isolates their combined cost)           [junk]
  dq_only   — only ds chain + dq dot (drops dv/dp... keeps dp)     [junk]
  b16chain  — p/ds chain in bf16 (dots keep f32 accum)             [approx]
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
N = BB * T
NBLK = R // N
CHAIN = int(os.environ.get("CHAIN", "400"))


def timeit(fn, *args, iters=5, warmup=2):
    @jax.jit
    def chained(*xs):
        def body(c, _):
            o = fn(*c)
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


def bwd_variant(mode):
    feed_p = mode == "nos"

    def kern(qkv_ref, do_ref, inv_ref, *rest):
        # pallas passes inputs first, then outputs: with the extra p input
        # the order is (qkv, do, inv, p, dqkv)
        if feed_p:
            p_in, dqkv_ref = rest
        else:
            (dqkv_ref,) = rest
        n, d3 = qkv_ref.shape
        d = d3 // 3
        scale = 1.0 / np.sqrt(HD)
        bias = pa._merged_bias(BB, T, T, False)
        qkv = qkv_ref[...]
        do = do_ref[...]
        inv_all = inv_ref[...]
        dt = dqkv_ref.dtype
        for h_i in range(H):
            q = qkv[:, h_i * HD:(h_i + 1) * HD]
            k = qkv[:, d + h_i * HD:d + (h_i + 1) * HD]
            v = qkv[:, 2 * d + h_i * HD:2 * d + (h_i + 1) * HD]
            do_h = do[:, h_i * HD:(h_i + 1) * HD]
            if feed_p:
                p32 = p_in[...].astype(jnp.float32)  # [n,n] one head only
            else:
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale + bias
                if mode == "noexp":
                    e = s
                else:
                    e = jnp.exp(jnp.minimum(s, 60.0))
                p32 = e * inv_all[:, h_i:h_i + 1]
            if mode == "b16chain":
                p = p32.astype(DT)
                dv = jax.lax.dot_general(p, do_h, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32
                                         ).astype(DT)
                ds = p * (dp - jnp.sum(dp * p, -1, keepdims=True,
                                       dtype=DT))
                ds = (ds.astype(jnp.float32) * scale).astype(DT)
            else:
                p = p32.astype(DT)
                dv = jax.lax.dot_general(p, do_h, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                if mode == "nodsum":
                    ds = p32 * dp
                else:
                    ds = p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
                ds = (ds * scale).astype(DT)
            dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dqkv_ref[:, h_i * HD:(h_i + 1) * HD] = dq.astype(dt)
            dqkv_ref[:, d + h_i * HD:d + (h_i + 1) * HD] = dk.astype(dt)
            dqkv_ref[:, 2 * d + h_i * HD:2 * d + (h_i + 1) * HD] = \
                dv.astype(dt)

    extra_in = []
    extra_specs = []
    if feed_p:
        extra_specs = [pl.BlockSpec((N, N), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)]

    @jax.jit
    def run(qkv, do, inv, *extra):
        return pl.pallas_call(
            kern,
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec((N, 3 * D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + extra_specs,
            out_specs=pl.BlockSpec((N, 3 * D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 3 * D), DT),
        )(qkv, do, inv, *extra)
    return run


def main():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (R, 3 * D), DT)
    do = jax.random.normal(key, (R, D), DT)
    inv = jnp.abs(jax.random.normal(key, (R, H), jnp.float32)) * 0.02
    print(f"bwd kernel ablation: R={R} block={N} x {NBLK}, {H} heads x {HD},"
          f" CHAIN={CHAIN}")
    for mode in ("full", "nodsum", "noexp", "b16chain"):
        fn = bwd_variant(mode)
        print(f"  {mode:9s}: {timeit(fn, qkv, do, inv):7.3f} ms")
    fn = bwd_variant("nos")
    pblk = jax.random.normal(key, (R, N), DT)   # one head's p per block row
    print(f"  {'nos':9s}: {timeit(fn, qkv, do, inv, pblk):7.3f} ms")


if __name__ == "__main__":
    main()
