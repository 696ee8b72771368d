"""verify_weights entry point: honest all-missing table + verified rows
against synthetic checkpoints (VERDICT r1 item 8)."""
import numpy as np
import pytest

from aphantasia_tpu.verify_weights import main as vw_main


def test_all_missing_table(tmp_path, capsys, monkeypatch):
    for var in ("APHANTASIA_CLIP_PT", "APHANTASIA_AEST_PT",
                "APHANTASIA_LPIPS_PT", "APHANTASIA_DAV2_PT",
                "APHANTASIA_VQGAN_PT"):
        monkeypatch.delenv(var, raising=False)
    rc = vw_main([str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0  # missing is reported, not failed
    assert out.count("MISSING") == 5
    assert "0 torch-verified, 5 missing, 0 failed" in out


def test_aesthetic_checkpoint_verified(tmp_path, capsys, monkeypatch):
    torch = pytest.importorskip("torch")
    for var in ("APHANTASIA_CLIP_PT", "APHANTASIA_AEST_PT",
                "APHANTASIA_LPIPS_PT", "APHANTASIA_DAV2_PT",
                "APHANTASIA_VQGAN_PT"):
        monkeypatch.delenv(var, raising=False)
    lin = torch.nn.Linear(512, 1)
    torch.save(lin.state_dict(), str(tmp_path / "sa_0_4_vit_b_32_linear.pth"))
    rc = vw_main([str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "1 torch-verified" in out and "4 missing" in out
    aest_line = [ln for ln in out.splitlines()
                 if ln.strip().startswith("aesthetic")][0]
    assert "verified" in aest_line


def test_failed_checkpoint_sets_exit_code(tmp_path, capsys, monkeypatch):
    for var in ("APHANTASIA_CLIP_PT", "APHANTASIA_AEST_PT",
                "APHANTASIA_LPIPS_PT", "APHANTASIA_DAV2_PT",
                "APHANTASIA_VQGAN_PT"):
        monkeypatch.delenv(var, raising=False)
    (tmp_path / "lpips_vgg.pt").write_bytes(b"not a checkpoint")
    rc = vw_main([str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "1 failed" in out
