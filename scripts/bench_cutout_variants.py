"""Microbench: cutout-contraction FORMULATION variants (VERDICT r3 item 2).

The production path (ops/sampler._contract, W-first two-einsum) measured
4.12 ms fwd+bwd at the headline geometry vs the ~3.8 ms dense flop bound
(bench_cutout_micro.py, r4).  The blocked VMEM-resident Pallas kernel
LOSES (4.38 ms at the only VMEM-fitting block size BS=1 — per-sample
serialization), so the remaining lever is how XLA maps the einsums: batch
dims, contraction order, output layouts.  This sweeps formulations that
are all algebraically identical to the production contraction:

  v0 production    tmp=einsum(snw,chw->scnh); einsum(smh,scnh->scmn)
  v1 single-einsum einsum(smh,chw,snw->scmn)   (XLA picks the path)
  v2 big-matmul    [C*H,W]@[W,S*N] -> [c,h,s,n]; einsum(smh,chsn->scmn)
  v3 layout snch   tmp=einsum(snw,chw->snch); einsum(smh,snch->scmn)
  v4 bf16-out      v0 with the final store in bf16 (the step feeds bf16
                   augs anyway — saves half the [S,C,M,N] write+read)

Run on the real chip: `python scripts/bench_cutout_variants.py`.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.sampler import CutoutSampler, _contract

H, W, C, S, M = 720, 1280, 3, 200, 224
DT = jnp.bfloat16
CHAIN = int(os.environ.get("CHAIN", "50"))


def timeit(fn, img, *rest, iters=5, warmup=2):
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
        pull(chained(img, *rest))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(img, *rest))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3 / CHAIN)


def l2(o):
    return jnp.sum(o.astype(jnp.float32) ** 2)


def v0(img, wy, wx):
    return _contract(img, wy, wx, "bfloat16")


def v1(img, wy, wx):
    return jnp.einsum("smh,chw,snw->scmn", wy, img.astype(DT), wx,
                      preferred_element_type=jnp.float32)


def v2(img, wy, wx):
    big = jax.lax.dot_general(
        img.astype(DT).reshape(C * H, W), wx.reshape(S * M, W),
        (((1,), (1,)), ((), ())), preferred_element_type=DT)  # [CH, SN]
    tmp = big.reshape(C, H, S, M)
    return jnp.einsum("smh,chsn->scmn", wy, tmp,
                      preferred_element_type=jnp.float32)


def v3(img, wy, wx):
    tmp = jnp.einsum("snw,chw->snch", wx, img.astype(DT),
                     preferred_element_type=DT)
    return jnp.einsum("smh,snch->scmn", wy, tmp,
                      preferred_element_type=jnp.float32)


def v4(img, wy, wx):
    tmp = jnp.einsum("snw,chw->scnh", wx, img.astype(DT),
                     preferred_element_type=DT)
    return jnp.einsum("smh,scnh->scmn", wy, tmp,
                      preferred_element_type=DT)      # bf16 store


VARIANTS = [("v0 production", v0), ("v1 single-einsum", v1),
            ("v2 big-matmul", v2), ("v3 snch-layout", v3),
            ("v4 bf16-out", v4)]


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (C, H, W), DT)
    sampler = CutoutSampler((H, W), S, M, align="uniform", macro=0.4)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes, dtype=DT)
    print(f"geometry: S={S} frame {H}x{W} -> {M}x{M}  chain={CHAIN}")

    ref = jax.jit(v0)(img, wy, wx).astype(jnp.float32)
    for name, fn in VARIANTS:
        try:
            f = jax.jit(fn)
            got = f(img, wy, wx).astype(jnp.float32)
            dev = float(jnp.abs(ref - got).max())
            tf = timeit(fn, img, wy, wx)
            g = jax.grad(lambda i, a, b: l2(fn(i, a, b)))
            tg = timeit(g, img, wy, wx)
            print(f"{name:18s} fwd {tf:6.3f} ms   f+b {tg:6.3f} ms"
                  f"   parity {dev:.2e}")
        except Exception as e:
            print(f"{name:18s} FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
