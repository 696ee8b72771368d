"""One-command TPU measurement runbook for the items blocked on the axon
tunnel (docs/ROUND2_NOTES.md sessions 3-4).  Run on the real chip:

    timeout 3600 python scripts/tpu_runbook.py            # everything
    python scripts/tpu_runbook.py --only persp,profile    # subset

Stages (each prints a PASS/number line; all state goes to stdout):
  persp    Mosaic compile + TPU parity of ops/pallas_persp.py (the exact
           perspective kernel shipped hardware-unverified while the
           tunnel was down) vs the XLA gather op, fwd + VJP.
  ab       step-cost A/B of the default affine fit vs the exact kernel
           (APHANTASIA_EXACT_PERSP=1); r3 scanned-bench result:
           24.4 vs 7.7 it/s (docs/TPU_MEASUREMENTS_r3.md).
  profile  component step-cost table (scripts/profile_step.py inline).
  attn     APHANTASIA_ATTN_ROWS sweep {128,256,384,512} on the full step.
  bench    headline bench.py JSON line (>=28 it/s target).
  video    bench_illustrip depth-mode sustained f/min (>=35 target after
           the double-buffered DA-V2 dispatch).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _fresh_env(**extra):
    env = dict(os.environ)
    env.update({k: str(v) for k, v in extra.items()})
    # PREPEND the repo: the inherited PYTHONPATH carries the axon
    # sitecustomize that registers the TPU plugin — clobbering it makes
    # every subprocess fail with "Unable to initialize backend 'axon'"
    prior = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = ROOT + (os.pathsep + prior if prior else "")
    return env


def _run(cmd, **extra):
    print(f"\n$ {' '.join(cmd)}" + (f"   [{extra}]" if extra else ""),
          flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, env=_fresh_env(**extra), cwd=ROOT)
    print(f"  -> exit {r.returncode} in {time.time() - t0:.0f}s", flush=True)
    return r.returncode


def stage_persp():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aphantasia_tpu.ops.pallas_persp import perspective_warp
    from aphantasia_tpu.ops.perspective import (perspective_endpoints,
                                                perspective_coeffs,
                                                homography_warp)
    assert jax.devices()[0].platform in ("tpu", "axon"), "not on TPU"
    s, h, w = 8, 224, 224
    img = jax.random.normal(jax.random.PRNGKey(1), (s, 3, h, w), jnp.float32)
    sp, ep = perspective_endpoints(jax.random.PRNGKey(0), s, h, w, 0.33, 0.7)
    coef = perspective_coeffs(sp, ep)
    flags = (jnp.abs(ep - sp[None]).max((1, 2)) > 0).astype(jnp.int32)
    out = jax.jit(perspective_warp)(img, coef, flags)
    # flag-0 samples are exact copies (torchvision Bernoulli-fail
    # semantics); coeffs of identity endpoints are NOT an exact identity
    # map (pixel-center convention), so mask the reference by the flags
    m = (flags > 0)[:, None, None, None]
    ref = jnp.where(m, homography_warp(img, coef), img)
    dev = float(jnp.abs(out - ref).max())
    co = jax.random.normal(jax.random.PRNGKey(2), img.shape)
    g1 = jax.jit(jax.grad(
        lambda x: jnp.sum(perspective_warp(x, coef, flags) * co)))(img)
    g2 = jax.grad(lambda x: jnp.sum(
        jnp.where(m, homography_warp(x, coef), x) * co))(img)
    gdev = float(jnp.abs(g1 - g2).max())
    ok = dev <= 1e-3 and gdev <= 1e-3
    print(f"persp: {'PASS' if ok else 'FAIL'} fwd_dev={dev:.2e} "
          f"bwd_dev={gdev:.2e} (Mosaic compile + TPU numerics)", flush=True)
    # bf16 production path compiles too
    perspective_warp(img.astype(jnp.bfloat16), coef, flags).block_until_ready()
    print("persp: bf16 path compiled OK", flush=True)

    # rotate family + compaction (r4 kernel rework) on-chip parity
    from aphantasia_tpu.ops.pallas_persp import perspective_warp_compact
    from aphantasia_tpu.ops.perspective import rotation_coeffs_for
    ang = jnp.asarray([0, -30, 15, 7, 0, -3, 29, 11], jnp.float32)
    rcoef = rotation_coeffs_for(ang, h, w)
    rflags = (jnp.abs(ang) > 0).astype(jnp.int32)
    rout = jax.jit(lambda x: perspective_warp(
        x, rcoef, rflags, family="rotate"))(img)
    rm = (rflags > 0)[:, None, None, None]
    rref = jnp.where(rm, homography_warp(img, rcoef), img)
    rdev = float(jnp.abs(rout - rref).max())
    rg1 = jax.jit(jax.grad(lambda x: jnp.sum(perspective_warp(
        x, rcoef, rflags, family="rotate") * co)))(img)
    rg2 = jax.grad(lambda x: jnp.sum(
        jnp.where(rm, homography_warp(x, rcoef), x) * co))(img)
    rgdev = float(jnp.abs(rg1 - rg2).max())
    cout = jax.jit(lambda x: perspective_warp_compact(
        x, coef, flags, budget=7))(img)        # budget < s: compact path
    cdev = float(jnp.abs(cout - out).max())
    cg = jax.jit(jax.grad(lambda x: jnp.sum(perspective_warp_compact(
        x, coef, flags, budget=7) * co)))(img)
    cgdev = float(jnp.abs(cg - g1).max())
    rok = rdev <= 1e-3 and rgdev <= 1e-3 and cdev == 0.0 and cgdev == 0.0
    print(f"persp: rotate {'PASS' if rok else 'FAIL'} fwd_dev={rdev:.2e} "
          f"bwd_dev={rgdev:.2e} compact_dev={cdev:.2e}/{cgdev:.2e}",
          flush=True)
    return ok and rok


def stage_ab():
    py = sys.executable
    print("\n== affine-fit perspective (default since r3) ==", flush=True)
    _run([py, "scripts/profile_step.py", "--reps", "20"])
    print("\n== exact kernel (APHANTASIA_EXACT_PERSP=1) ==", flush=True)
    _run([py, "scripts/profile_step.py", "--reps", "20"],
         APHANTASIA_EXACT_PERSP="1")


def stage_profile():
    _run([sys.executable, "scripts/profile_step.py", "--reps", "30"])


def stage_attn():
    for rows in (128, 256, 384, 512):
        print(f"\n== APHANTASIA_ATTN_ROWS={rows} ==", flush=True)
        _run([sys.executable, "scripts/profile_step.py", "--reps", "15"],
             APHANTASIA_ATTN_ROWS=rows)


def stage_fused():
    """Fused ViT half-block kernels (ops/pallas_block.py, opt-in until
    TPU-validated): step cost with and without, at the best attn-rows."""
    print("\n== baseline (unfused blocks) ==", flush=True)
    _run([sys.executable, "scripts/profile_step.py", "--reps", "20"])
    print("\n== APHANTASIA_FUSED_BLOCK=1 ==", flush=True)
    _run([sys.executable, "scripts/profile_step.py", "--reps", "20"],
         APHANTASIA_FUSED_BLOCK="1")


def stage_bench():
    _run([sys.executable, "bench.py"])


def stage_video():
    _run([sys.executable, "bench_illustrip.py"])


STAGES = {"persp": stage_persp, "ab": stage_ab, "profile": stage_profile,
          "attn": stage_attn, "fused": stage_fused, "bench": stage_bench,
          "video": stage_video}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of " + ",".join(STAGES))
    a = ap.parse_args()
    names = a.only.split(",") if a.only else list(STAGES)
    for n in names:
        print(f"\n########## stage: {n} ##########", flush=True)
        try:
            STAGES[n]()
        except Exception as e:  # keep later stages running
            print(f"stage {n} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
