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


# fixed sentence set for the tokenizer-readiness probe (VERDICT r4 item 8);
# covers lowercase folding, punctuation splits, unicode, contractions, and
# the long-prompt truncation path — the shapes the reference feeds through
# clip.tokenize (/root/reference/clip_fft.py:150)
TOKENIZER_SENTENCES = [
    "a watercolor painting of a fox in a snowy forest",
    "The Quick Brown Fox; jumps over 12 lazy dogs!",
    "café au lait — naïve élève",
    "it's a beautifully-lit macro photo, isn't it?",
    "word " * 90,  # > 77 tokens: exercises truncation
]


def _tokenizer_readiness():
    """Tokenize the fixed sentence set; when the real merges table is
    present (APHANTASIA_BPE_PATH / installed `clip`), record the real ids
    and — if the upstream `clip` package is importable — compare id-for-id
    against clip.tokenize.  The last untested-real-input path (the real
    BPE vocab, never seen in the zero-egress build env) is then exercised
    by the same one command as the weights."""
    from aphantasia_tpu.models.clip import tokenizer as tk
    # drop any pre-discovery cached tokenizer so the probe (and the render
    # after it) sees the merges file the env setup above just resolved
    tk._tokenizer.cache_clear()
    out = {"bpe_path": tk._find_bpe_vocab(),
           "real_vocab": False, "upstream_match": None, "sentences": []}
    tok = tk._tokenizer()
    out["real_vocab"] = isinstance(tok, tk.SimpleTokenizer)
    try:
        import clip as _clip
        upstream = lambda s: _clip.tokenize([s], truncate=True).numpy()[0]
    except Exception:
        upstream = None
    matches = []
    for s in TOKENIZER_SENTENCES:
        ids = tk.tokenize(s)[0]
        row = {"text": (s[:40] + "...") if len(s) > 40 else s,
               "n_ids": int((ids != 0).sum()), "ids_head": ids[:8].tolist()}
        if upstream is not None and out["real_vocab"]:
            ref = upstream(s)
            row["upstream_match"] = bool((ids == ref).all())
            matches.append(row["upstream_match"])
        out["sentences"].append(row)
    if matches:
        out["upstream_match"] = all(matches)
    return out


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
        bpe = os.path.join(a.ckpt_dir, "bpe_simple_vocab_16e6.txt.gz")
        if os.path.isfile(bpe):
            os.environ.setdefault("APHANTASIA_BPE_PATH", bpe)
    # the checkpoint the render will ACTUALLY use (env var may have been
    # pre-set externally to a different file than the tower table verified)
    clip_pt_used = os.environ.get("APHANTASIA_CLIP_PT")
    clip_pt_from_dir = bool(
        clip_pt_used and a.ckpt_dir
        and os.path.dirname(os.path.abspath(clip_pt_used))
        == os.path.abspath(a.ckpt_dir))

    report["tokenizer"] = _tokenizer_readiness()

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
        "real_clip": bool(clip_pt_used),
        "clip_ckpt": clip_pt_used,          # resolved path actually used
        "clip_ckpt_from_ckpt_dir": clip_pt_from_dir,
    }
    report["summary"] = {
        "verified": sum(r[2] == "verified" for r in rows),
        "converted": sum(r[2] == "converted" for r in rows),
        "missing": sum(r[2] == "MISSING" for r in rows),
        "failed": sum(r[2] == "FAILED" for r in rows),
        "total_seconds": round(time.time() - t0, 1),
        "tokenizer_real_vocab": report["tokenizer"]["real_vocab"],
        "tokenizer_upstream_match": report["tokenizer"]["upstream_match"],
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
