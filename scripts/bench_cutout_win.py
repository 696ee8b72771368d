"""Microbench: windowed cutout forward vs the dense XLA contraction.

The r4 windowed kernel (ops/pallas_cutout_win.py) cuts the cutout
contraction's flops ~1.7x by only touching each crop's [csize+slack]^2
window (3 exact tiers), with the frame pinned in VMEM.  This times, at
the headline geometry:

  * dense XLA fwd / fwd+bwd (production, incl. weight build)
  * windowed fwd / fwd+bwd (windowed weights + kernel fwd, dense bwd)

Both timings INCLUDE their weight builds (the builds differ — that is
part of the comparison).  Run: `python scripts/bench_cutout_win.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.sampler import CutoutSampler, _contract, _win_cut

H, W, C, S, M = 720, 1280, 3, 200, 224
DT = jnp.bfloat16
CHAIN = int(os.environ.get("CHAIN", "30"))


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


def main():
    img = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), DT)
    sampler = CutoutSampler((H, W), S, M, align="uniform", macro=0.4)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    from aphantasia_tpu.ops.pallas_cutout_win import tier_plan, window_bases
    tier, _, _ = window_bases(boxes, H, W, M)
    counts = [int((np.asarray(tier) == i).sum()) for i in range(3)]
    print(f"geometry: S={S} frame {H}x{W} -> {M}x{M} chain={CHAIN}; "
          f"tiers {tier_plan(H, W, M)} counts {counts}")

    def dense(i, b):
        wy, wx = sampler.weight_matrices(b, dtype=DT)
        return _contract(i, wy, wx, "bfloat16")

    def win(i, b):
        return _win_cut(sampler, "bfloat16", i, b.csize, b.offx, b.offy)

    ref = jax.jit(dense)(img, boxes).astype(jnp.float32)
    got = jax.jit(win)(img, boxes).astype(jnp.float32)
    dev = float(jnp.abs(ref - got).max())
    print(f"parity fwd: {dev:.2e}")

    print(f"dense fwd (incl build): {timeit(dense, img, boxes):7.3f} ms")
    print(f"win   fwd (incl build): {timeit(win, img, boxes):7.3f} ms")
    gd = jax.grad(lambda i, b: l2(dense(i, b)))
    gw = jax.grad(lambda i, b: l2(win(i, b)))
    print(f"dense f+b             : {timeit(gd, img, boxes):7.3f} ms")
    print(f"win   f+b             : {timeit(gw, img, boxes):7.3f} ms")


if __name__ == "__main__":
    main()
