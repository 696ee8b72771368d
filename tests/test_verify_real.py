"""CI dress rehearsal for the real-weight proof kit (VERDICT r3 item 7).

scripts/verify_real.py is the one-command proof the moment real
checkpoints exist: convert + verify every tower, render through the real
clip_fft CLI with the converted CLIP, record CLIP-cosine + render info in
one JSON.  No real weights can exist in this environment, so this drives
the kit over the SAME full-size synthetic checkpoints the converter tier
uses (tests/test_convert_full.py builders) at a tiny render config — the
kit is proven executable end-to-end before a weights-bearing environment
exists (docs/WEIGHTS.md documents the real-weights invocation).
"""
import json
import os
import sys

import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # integration tier (with test_convert_full)

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def test_verify_real_dress_rehearsal(tmp_path, monkeypatch):
    from test_convert_full import (build_aesthetic, build_clip)

    ckpts = tmp_path / "ckpts"
    ckpts.mkdir()
    # CLIP (drives the render + cosine row) and the aesthetic head (small);
    # the remaining towers exercise the MISSING path of the report
    build_clip(ckpts / "ViT-B-32.pt")
    build_aesthetic(ckpts / "sa_0_4_vit_b_32_linear.pth")

    monkeypatch.delenv("APHANTASIA_CLIP_PT", raising=False)
    sys.path.insert(0, _SCRIPTS)
    try:
        import verify_real
        out = tmp_path / "out"
        rc = verify_real.run([str(ckpts), "--out", str(out),
                              "--size", "96-64", "--steps", "2",
                              "--samples", "3"])
    finally:
        sys.path.remove(_SCRIPTS)

    assert rc == 0
    report = json.loads((out / "verify_real.json").read_text())
    # tower table present, CLIP verified with an extracted cosine
    clip_row = next(t for t in report["towers"]
                    if t["component"] == "clip ViT-B/32")
    assert clip_row["status"] == "verified"
    assert report["clip_cosine"] is not None
    assert report["clip_cosine"] >= 0.98
    assert report["summary"]["fidelity_met"] is True
    aest_row = next(t for t in report["towers"]
                    if t["component"] == "aesthetic")
    assert aest_row["status"] in ("verified", "converted")
    # the render ran through the real CLI with the converted checkpoint,
    # and the report names the RESOLVED path it actually used (r5,
    # ADVICE r4: env-var presence alone can over-claim)
    assert report["render"]["rc"] == 0
    assert report["render"]["real_clip"] is True
    assert report["render"]["clip_ckpt"] == str(ckpts / "ViT-B-32.pt")
    assert report["render"]["clip_ckpt_from_ckpt_dir"] is True
    assert report["render"]["n_frames"] >= 1
    assert os.path.isfile(report["render"]["final_jpg"])
    # tokenizer readiness section (VERDICT r4 item 8): no merges file in
    # this hermetic env -> hash fallback, honestly reported
    assert report["tokenizer"]["real_vocab"] is False
    assert len(report["tokenizer"]["sentences"]) == 5
    assert report["summary"]["tokenizer_real_vocab"] is False


def test_verify_real_tokenizer_picks_up_merges(tmp_path, monkeypatch):
    """A bpe_simple_vocab_16e6.txt.gz sitting in the ckpt dir is discovered
    and drives the tokenizer probe (real_vocab True, truncation row at the
    full 77-context)."""
    import shutil
    from test_tokenizer import make_merges_file, HAND_MERGES
    from aphantasia_tpu.models.clip import tokenizer as tk

    ckpts = tmp_path / "ckpts"
    ckpts.mkdir()
    synth = make_merges_file(tmp_path, HAND_MERGES)
    shutil.copy(synth, ckpts / "bpe_simple_vocab_16e6.txt.gz")
    monkeypatch.delenv("APHANTASIA_BPE_PATH", raising=False)

    sys.path.insert(0, _SCRIPTS)
    try:
        import verify_real
        monkeypatch.setenv("APHANTASIA_BPE_PATH",
                           str(ckpts / "bpe_simple_vocab_16e6.txt.gz"))
        tok = verify_real._tokenizer_readiness()
    finally:
        sys.path.remove(_SCRIPTS)
        tk._tokenizer.cache_clear()

    assert tok["real_vocab"] is True
    assert tok["bpe_path"] == str(ckpts / "bpe_simple_vocab_16e6.txt.gz")
    trunc_row = tok["sentences"][-1]
    assert trunc_row["n_ids"] == 77  # long prompt exercises truncation
    for row in tok["sentences"]:
        assert row["ids_head"][0] == tk.SOT
