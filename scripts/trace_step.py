"""Per-op device-time profile of the headline train step (bench.py config).

Captures a jax.profiler trace of the exact scanned train loop bench.py
times, parses the XPlane protobuf (via tensorflow's bundled proto defs),
and prints device-time aggregates: per XLA op-category and the top
individual fusions/custom-calls.  This is the committed version of the
round-3 inline trace analysis that found the cutout-contraction HBM
round-trip and sized the attention core.

Usage (on the real chip):  python scripts/trace_step.py [--steps 3]
Env knobs under test propagate (APHANTASIA_ATTN_PADDED, ...).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_loop():
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    size, samples = (720, 1280), 200
    dtype = jnp.bfloat16
    cfg = CLIP_CONFIGS["ViT-B/32"]
    key = jax.random.PRNGKey(0)
    clip_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        clip_init(key, cfg))
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4, chunk=0,
                            use_pallas=False)
    settings = StepSettings(sim="mix", transform="fast", total_steps=200,
                            clip_dtype=dtype)
    optimizer = build_optimizer("adam_custom", 0.05)
    inner = 40
    loop = build_train_loop(par, sampler, cfg, settings, optimizer, inner)

    gen_params = par.init(jax.random.PRNGKey(1))
    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((samples, cfg.embed_dim))
    embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
    prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)

    state = [gen_params, opt_state, prev_enc]

    def run_chunk(i, key):
        state[0], state[1], state[2], losses = loop(
            state[0], state[1], state[2], clip_params, None, None,
            prompts, key, jnp.int32(i))
        return losses

    return run_chunk, inner


def parse_xplane(path):
    """-> (device_total_ps, {op_name: total_ps}, {category: total_ps}).

    Aggregates only the TensorCore line(s) (XLA Ops), skipping host threads
    and the async-DMA lines that overlap compute."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    with open(path, "rb") as f:
        space = xplane_pb2.XSpace.FromString(f.read())
    per_op = defaultdict(int)
    per_cat = defaultdict(int)
    per_full = defaultdict(int)
    span_min, span_max = None, None
    for plane in space.planes:
        if "TPU" not in plane.name or "XLA Ops" not in str(
                [l.name for l in plane.lines]):
            # device op plane: its lines include "XLA Ops"
            pass
        if "TPU" not in plane.name:
            continue
        stats_meta = {i: m.name for i, m in plane.stat_metadata.items()}
        stats_vals = {i: m for i, m in plane.stat_metadata.items()}
        ev_meta = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                short = name.split(" = ")[0].lstrip("%")
                if short.startswith("while"):
                    continue      # the outer scan-loop op spans everything
                dur = ev.duration_ps
                t0 = ev.offset_ps
                span_min = t0 if span_min is None else min(span_min, t0)
                span_max = (t0 + dur if span_max is None
                            else max(span_max, t0 + dur))
                per_op[short] += dur
                per_full[name] += dur
                cat = None
                for st in ev.stats:
                    if stats_meta.get(st.metadata_id, "") == "hlo_category":
                        cat = (st.str_value
                               or stats_vals[st.ref_value].name
                               if st.ref_value in stats_vals else
                               st.str_value)
                if not cat:
                    # fall back to the op-name prefix before digits
                    cat = short.split(".")[0]
                per_cat[cat] += dur
    total = (span_max - span_min) if span_min is not None else 0
    return total, per_op, per_cat, per_full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2,
                    help="scan chunks to trace (each = 40 inner steps)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--grep", default=None,
                    help="also print the full HLO text of ops whose name "
                         "starts with this prefix")
    ap.add_argument("--dump-top", type=int, default=0,
                    help="print the full HLO text of the N most expensive "
                         "individual ops (name-agnostic)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    run_chunk, inner = build_loop()
    keys = jax.random.split(jax.random.PRNGKey(3), args.steps + 1)
    # warm up / compile outside the trace
    losses = run_chunk(0, keys[0])
    float(losses[-1])

    tdir = tempfile.mkdtemp(prefix="trace_step_")
    with jax.profiler.trace(tdir):
        for i in range(args.steps):
            losses = run_chunk((1 + i) * inner, keys[1 + i])
        float(losses[-1])

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane captured", file=sys.stderr)
        sys.exit(1)
    total, per_op, per_cat, per_full = parse_xplane(paths[0])
    nsteps = args.steps * inner
    print(f"traced {nsteps} steps; device span {total/1e9:.2f} ms "
          f"({total/1e9/nsteps:.3f} ms/step)")
    busy = sum(per_op.values())
    print(f"TensorCore busy: {busy/1e9:.2f} ms ({100*busy/max(total,1):.1f}%"
          f" of span)\n")
    print("== by category (ms/step) ==")
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {cat:40s} {ps/1e9/nsteps:8.3f}")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, ps in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {name:64s} {ps/1e9/nsteps:8.4f}")

    if args.grep:
        print(f"\n== full HLO for ops matching '{args.grep}' ==")
        shown = 0
        for name, ps in sorted(per_full.items(), key=lambda kv: -kv[1]):
            short = name.split(" = ")[0].lstrip("%")
            if short.startswith(args.grep) and shown < 6:
                print(f"\n--- {ps/1e9/nsteps:.4f} ms/step ---")
                print(name[:2000])
                shown += 1

    if args.dump_top:
        print(f"\n== full HLO of the top {args.dump_top} ops ==")
        for name, ps in sorted(per_full.items(),
                               key=lambda kv: -kv[1])[:args.dump_top]:
            print(f"\n--- {ps/1e9/nsteps:.4f} ms/step ---")
            print(name[:2400])


if __name__ == "__main__":
    main()
