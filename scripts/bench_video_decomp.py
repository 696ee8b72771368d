"""Decompose the illustrip frames/min budget: compute vs frame delivery.

The video metric (bench.py / bench_illustrip.py) measures DELIVERED
frames/min through the real CLI — which on the tunneled chip includes
pulling every 2.7 MB uint8 720p frame through a ~13 MB/s link
(BASELINE.md measured the link for clip_fft).  This isolates the terms:

  compute : N frame-program dispatches, ONE scalar pull at the end
            (the on-device frame-advance rate — what a PCIe-attached
            host would sustain before writer limits)
  sync    : N dispatches,every frame pulled to host synchronously
            (upper bound on the transfer cost; the CLI's async writer
            overlaps it, so production sits between the two)

Run on the real chip: `python scripts/bench_video_decomp.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("FRAMES", "24"))


def build(size=(720, 1280), samples=100, opt_steps=3):
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    from aphantasia_tpu.parallel.step import StepSettings, build_frame_step

    cfg = CLIP_CONFIGS["ViT-B/32"]
    dtype = jnp.bfloat16
    clip_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        clip_init(jax.random.PRNGKey(0), cfg))
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(sim="mix", transform="fast", total_steps=300,
                            clip_dtype=dtype)
    optimizer = build_optimizer("adam_custom", 0.05)
    frame_fn = jax.jit(build_frame_step(par, sampler, cfg, settings,
                                        optimizer, "FFT", size, opt_steps,
                                        smooth=False))
    gp = par.init(jax.random.PRNGKey(1))
    embs = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.embed_dim))
    prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
    state = dict(gp=gp, os=optimizer.init(gp),
                 pe=jnp.zeros((samples, cfg.embed_dim)))
    motion = tuple(jnp.float32(v) for v in (0.3, 2.0, -1.0, 1.01, 0.1))
    return frame_fn, state, clip_params, prompts, motion


def main():
    frame_fn, st, clip_params, prompts, motion = build()
    key = jax.random.PRNGKey(3)

    def advance(i, pull_frame):
        nonlocal st
        gp, os_, pe, frame, losses = frame_fn(
            st["gp"], st["os"], st["pe"], clip_params, None, prompts,
            jax.random.fold_in(key, i), jnp.int32(i), motion)
        st = dict(gp=gp, os=os_, pe=pe)
        if pull_frame:
            return np.asarray(frame)
        return losses

    # warm / compile
    l = advance(0, False)
    float(l[-1])

    t0 = time.perf_counter()
    for i in range(1, 1 + N):
        l = advance(i, False)
    float(l[-1])                              # single completion pull
    dt_c = time.perf_counter() - t0

    t0 = time.perf_counter()
    nbytes = 0
    for i in range(1 + N, 1 + 2 * N):
        f = advance(i, True)                  # per-frame sync pull
        nbytes += f.nbytes
    dt_s = time.perf_counter() - t0

    per_frame_transfer = (dt_s - dt_c) / N
    bw = (nbytes / N) / max(per_frame_transfer, 1e-9) / 1e6

    # the production path: enqueue device frames on the AsyncFrameWriter
    # (off-thread pull + JPEG encode + fs write), close() to drain
    import tempfile
    from aphantasia_tpu.io.media import AsyncFrameWriter
    out = tempfile.mkdtemp(prefix="vdecomp_")

    def writer_pass(i0, pipelined):
        os.environ["APHANTASIA_WRITER_PIPELINED"] = "1" if pipelined else "0"
        writer = AsyncFrameWriter()
        t0 = time.perf_counter()
        for i in range(i0, i0 + N):
            gp, os_, pe, frame, losses = frame_fn(
                st["gp"], st["os"], st["pe"], clip_params, None, prompts,
                jax.random.fold_in(key, i), jnp.int32(i), motion)
            st.update(gp=gp, os=os_, pe=pe)
            writer.save(os.path.join(out, f"{i:06d}.jpg"), frame)
        writer.close()
        return time.perf_counter() - t0

    dt_w = writer_pass(1 + 2 * N, pipelined=False)
    dt_wp = writer_pass(1 + 3 * N, pipelined=True)
    dt_w2 = writer_pass(1 + 4 * N, pipelined=False)   # drift control

    print(f"frames={N} @720p, 100 samples, 3 opt-steps, FFT, no depth")
    print(f"compute-only       : {N / dt_c * 60:7.1f} frames/min "
          f"({dt_c / N * 1e3:.0f} ms/frame)")
    print(f"with sync pulls    : {N / dt_s * 60:7.1f} frames/min "
          f"({dt_s / N * 1e3:.0f} ms/frame)")
    print(f"async writer + jpg : {N / dt_w * 60:7.1f} frames/min "
          f"({dt_w / N * 1e3:.0f} ms/frame, drained)")
    print(f"  pipelined writer : {N / dt_wp * 60:7.1f} frames/min "
          f"({dt_wp / N * 1e3:.0f} ms/frame)")
    print(f"  serial again     : {N / dt_w2 * 60:7.1f} frames/min "
          f"({dt_w2 / N * 1e3:.0f} ms/frame, drift control)")
    print(f"implied transfer   : {per_frame_transfer * 1e3:7.0f} ms/frame "
          f"(~{bw:.1f} MB/s effective link)")
    print("the CLI adds its host loop (motion schedule, progress, encs) "
          "on top of the writer path; bench_illustrip.py measures it")


if __name__ == "__main__":
    main()
