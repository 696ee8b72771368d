"""Microbench: merged-heads attention fwd — block-diagonal super-dots.

The r3 deep dive (docs/TPU_MEASUREMENTS_r3.md §6) measured the flat
attention fwd at a ~0.25 ms/layer floor REGARDLESS of flops (8x flop cuts
barely moved it): ~24 MXU issues/layer (12 score + 12 out dots) at
~10 µs issue/serialization latency each.  The one direction never tried:
CUT THE ISSUE COUNT.  Merging `gh` heads into one dot via block-diagonal
K/V —

    S[i, (h,j)] = q[i, h-slice] . k[j, h-slice]
               = (q_block [n, gh*hd]) @ blockdiag(k_h) [gh*n, gh*hd]^T

— pays gh-fold contraction overcompute (the zeros) but produces ALL gh
heads' scores side-by-side with NO garbage in the output, so exp/softmax
VPU work is unchanged; even the per-head rowsums become one tiny
e @ blockdiag(ones) dot.  3 big dots per gh-group vs 2*gh small ones.

Run on the real chip: `python scripts/bench_attn_merged.py`.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphantasia_tpu.ops import pallas_attn as pa

B, T, D, H = 200, 50, 768, 12
HD = D // H
R = B * T
DT = jnp.bfloat16
CHAIN = int(os.environ.get("CHAIN", "200"))


def timeit(fn, qkv, iters=5, warmup=2):
    @jax.jit
    def chained(x):
        def body(c, _):
            o = fn(c)
            s = o.astype(jnp.float32).sum() * 1e-9
            return c + s.astype(c.dtype), ()
        return jax.lax.scan(body, x, None, length=CHAIN)[0]

    def pull(x):
        return float(jnp.asarray(x.reshape(-1)[0], jnp.float32))

    for _ in range(warmup):
        pull(chained(qkv))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(qkv))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3 / CHAIN)


def _merged_kernel(qkv_ref, o_ref, inv_ref, *, bb, n_heads, t, gh):
    n, d3 = qkv_ref.shape
    d = d3 // 3
    hd = d // n_heads
    scale = 1.0 / np.sqrt(hd)
    qkv = qkv_ref[...]
    ng = gh * n
    # cross-sample mask on the merged (h, j) lane axis: j = l % n
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, ng), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, ng), 1) % n
    ok = (rows // t) == (cols // t)

    # block-diagonal placement mask (dynamic_update_slice is not lowered
    # by Pallas TPU — tile the group's slab vertically and mask instead)
    bd = ((jax.lax.broadcasted_iota(jnp.int32, (ng, gh * hd), 0) // n)
          == (jax.lax.broadcasted_iota(jnp.int32, (ng, gh * hd), 1) // hd))

    for g0 in range(0, n_heads, gh):
        kg = qkv[:, d + g0 * hd:d + (g0 + gh) * hd]            # [n, gh*hd]
        vg = qkv[:, 2 * d + g0 * hd:2 * d + (g0 + gh) * hd]
        kb = jnp.where(bd, jnp.concatenate([kg] * gh, 0), 0)   # [gh*n, gh*hd]
        vb = jnp.where(bd, jnp.concatenate([vg] * gh, 0), 0)
        qa = qkv[:, g0 * hd:(g0 + gh) * hd]                    # [n, gh*hd]
        s = jax.lax.dot_general(qa, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        e = jnp.where(ok, jnp.exp(jnp.minimum(s, 60.0)), 0.0)  # [n, gh*n]
        ones_bd = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (ng, 128), 0) // n)
            == jax.lax.broadcasted_iota(jnp.int32, (ng, 128), 1),
            1.0, 0.0).astype(qkv.dtype)                        # [gh*n, 128]
        rs = jax.lax.dot_general(e.astype(qkv.dtype), ones_bd,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob = jax.lax.dot_general(e.astype(qkv.dtype), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        for h in range(gh):
            inv = 1.0 / rs[:, h:h + 1]
            o_ref[:, (g0 + h) * hd:(g0 + h + 1) * hd] = (
                ob[:, h * hd:(h + 1) * hd] * inv).astype(o_ref.dtype)
            inv_ref[:, g0 + h:g0 + h + 1] = inv


def merged_fwd(qkv, gh):
    bb = pa.flat_geometry(T, qkv.dtype)
    block = bb * T
    rp = qkv.shape[0]
    assert rp % block == 0
    out, inv = pl.pallas_call(
        functools.partial(_merged_kernel, bb=bb, n_heads=H, t=T, gh=gh),
        grid=(rp // block,),
        in_specs=[pl.BlockSpec((block, 3 * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((block, D), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block, H), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rp, D), qkv.dtype),
                   jax.ShapeDtypeStruct((rp, H), jnp.float32)),
    )(qkv)
    return out


def main():
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (R, 3 * D), DT)
           * 0.5)
    prod = jax.jit(lambda x: pa.attention_core_flat(x, H, T))
    ref = prod(qkv)
    print(f"geometry: R={R} t={T} d={D} h={H} chain={CHAIN}")
    print(f"production flat fwd  : {timeit(prod, qkv):7.3f} ms")
    for gh in (3, 6, 12):
        try:
            f = jax.jit(lambda x, g=gh: merged_fwd(x, g))
            got = f(qkv)
            dev = float(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32)).max())
            tm = timeit(f, qkv)
            print(f"merged gh={gh:2d} fwd     : {tm:7.3f} ms  parity={dev:.2e}")
        except Exception as e:
            print(f"merged gh={gh:2d} fwd     : FAIL "
                  f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
