"""Microbench: exact perspective/rotate Pallas kernel fwd / fwd+bwd.

Times ops/pallas_persp.perspective_warp at the headline augmentation
geometry ([200,3,224,224] bf16) for both stage families with their real
drawn fractions (persp: Bernoulli p=0.2; rotate: the ±30° 20x-zero menu,
~74% nonzero) — the instrument for VERDICT r3 item 1's kernel rework.

Run on the real chip: `python scripts/bench_persp_micro.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

S, C, H, W = 200, 3, 224, 224
DT = jnp.bfloat16
CHAIN = int(os.environ.get("CHAIN", "20"))

from aphantasia_tpu.ops.augs import _ROT_ANGLES
from aphantasia_tpu.ops.perspective import (perspective_endpoints,
                                            perspective_coeffs,
                                            rotation_coeffs_for)
from aphantasia_tpu.ops.pallas_persp import (perspective_warp,
                                             perspective_warp_compact)


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
    img = jax.random.normal(jax.random.PRNGKey(0), (S, C, H, W), DT)

    start, end = perspective_endpoints(jax.random.PRNGKey(1), S, H, W,
                                       distortion=0.33, p=0.2)
    pcoef = perspective_coeffs(start, end)
    pflags = (jnp.abs(end - start[None]).max((1, 2)) > 0).astype(jnp.int32)

    idx = jax.random.randint(jax.random.PRNGKey(2), (S,), 0, len(_ROT_ANGLES))
    ang = jnp.asarray(_ROT_ANGLES)[idx]
    rcoef = rotation_coeffs_for(ang, H, W)
    rflags = (jnp.abs(ang) > 0).astype(jnp.int32)

    print(f"geometry: [{S},{C},{H},{W}] bf16, chain={CHAIN}; drawn: "
          f"persp {int(pflags.sum())}/200, rotate {int(rflags.sum())}/200")

    for name, coef, flags, family, warp in (
            ("persp        ", pcoef, pflags, "persp", perspective_warp),
            ("persp compact", pcoef, pflags, "persp",
             perspective_warp_compact),
            ("rotate       ", rcoef, rflags, "rotate", perspective_warp)):
        fn = lambda i, c=coef, f=flags, fam=family, wp=warp: wp(
            i, c, f, family=fam)
        tf = timeit(fn, img)
        g = jax.grad(lambda i: l2(fn(i)))
        tg = timeit(g, img)
        print(f"{name}  fwd {tf:7.3f} ms    f+b {tg:7.3f} ms")


if __name__ == "__main__":
    main()
