"""One-command REAL-weight proof kit (VERDICT r3 item 7).

Given a directory of real checkpoints (the files the reference
auto-downloads: OpenAI CLIP jit archives — /root/reference/clip_fft.py:119;
LAION aesthetic head — /root/reference/aphantasia/utils.py:402-413; lpips
VGG16; HF Depth-Anything-V2 dirs — /root/reference/depth/depth.py:22-25;
taming VQGAN last.ckpt), this:

  1. converts + verifies every tower through the production converters
     (aphantasia_tpu.verify_weights.collect_rows — CLIP rows record the
     embedding cosine vs the torch/HF reference, target >= 0.98);
  2. renders a REAL image through the real CLI entry point
     (clip_fft, default 20 steps @ 1280x720) with the converted CLIP
     (+ aesthetic head when present);
  3. writes ONE JSON report (verify_real.json in --out) with the tower
     table, extracted cosines, and the render's losses + output path.

Usage:
    python scripts/verify_real.py /path/to/checkpoints \
        [--out DIR] [--size 1280-720] [--steps 20] [--samples 50]

With no real weights this still runs (towers report MISSING, the render
uses random init) — the CI dress rehearsal (tests/test_verify_real.py)
drives it over the synthetic full-size checkpoints so the kit is proven
executable before a weights-bearing environment exists.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", nargs="?", default=None,
                    help="directory of real checkpoints")
    ap.add_argument("--out", default="_out/verify_real")
    ap.add_argument("--size", default="1280-720")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--prompt", default="a watercolor painting of a fox "
                                        "in a snowy forest")
    a = ap.parse_args(argv)

    from aphantasia_tpu.verify_weights import collect_rows, CLIP_FILES

    t0 = time.time()
    rows, any_failed = collect_rows(a.ckpt_dir)
    report = {"ckpt_dir": a.ckpt_dir, "towers": [], "clip_cosine": None}
    for comp, path, status, detail in rows:
        entry = {"component": comp, "path": path, "status": status,
                 "detail": detail}
        m = re.search(r"(?:cos(?:ine)?|corr)[= ]([0-9.]+)", detail)
        if m:
            entry["cosine"] = float(m.group(1))
            if comp.startswith("clip") and report["clip_cosine"] is None:
                report["clip_cosine"] = float(m.group(1))
        report["towers"].append(entry)

    # point the CLI at the found checkpoints via the env-var discovery the
    # CLIs already use (aphantasia_tpu/weights.py)
    if a.ckpt_dir:
        for fname in CLIP_FILES:
            p = os.path.join(a.ckpt_dir, fname)
            if os.path.isfile(p):
                os.environ.setdefault("APHANTASIA_CLIP_PT", p)
                break

    os.makedirs(a.out, exist_ok=True)
    from aphantasia_tpu.cli import clip_fft
    argv_r = ["-t", a.prompt, "--size", a.size, "--steps", str(a.steps),
              "--samples", str(a.samples), "--out_dir", a.out, "-nv",
              "--save_pt"]
    t_r = time.time()
    rc = clip_fft.main(argv_r) or 0
    render_s = time.time() - t_r
    jpgs = sorted(glob.glob(os.path.join(a.out, "**", "*.jpg"),
                            recursive=True))
    report["render"] = {
        "argv": argv_r, "rc": rc, "seconds": round(render_s, 1),
        "final_jpg": jpgs[-1] if jpgs else None,
        "n_frames": len(jpgs),
        "real_clip": bool(os.environ.get("APHANTASIA_CLIP_PT")),
    }
    report["summary"] = {
        "verified": sum(r[2] == "verified" for r in rows),
        "converted": sum(r[2] == "converted" for r in rows),
        "missing": sum(r[2] == "MISSING" for r in rows),
        "failed": sum(r[2] == "FAILED" for r in rows),
        "total_seconds": round(time.time() - t0, 1),
        "fidelity_target": "clip_cosine >= 0.98 (BASELINE.json)",
        "fidelity_met": (report["clip_cosine"] is not None
                         and report["clip_cosine"] >= 0.98),
    }
    out_json = os.path.join(a.out, "verify_real.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"\nverify_real: wrote {out_json}")
    print(json.dumps(report["summary"]))
    return 1 if (any_failed or rc) else 0


if __name__ == "__main__":
    sys.exit(run())
