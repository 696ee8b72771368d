"""Smoke tests for the CLI entry points on tiny configs (SURVEY.md §4:
'every CLI path needs at least a smoke test' — the reference shipped
crashing flag combinations)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)


def test_clip_fft_tiny(tmp_path):
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "out")
    main(["-t", "test prompt", "--size", "48-48", "--steps", "2",
          "--samples", "3", "--out_dir", out, "--save_pt", "-nv",
          "--transform", "none"])
    run_dirs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    assert len(run_dirs) == 1
    frames = [f for f in os.listdir(os.path.join(out, run_dirs[0]))
              if f.endswith(".jpg")]
    assert len(frames) == 2
    pts = [f for f in os.listdir(out) if f.endswith(".pt")]
    assert len(pts) == 1
    # snapshot readable by our codec as a list (reference byte format)
    from aphantasia_tpu.io.checkpoint import load_pt
    obj = load_pt(os.path.join(out, pts[0]))
    assert isinstance(obj, list)
    assert obj[0].shape == (1, 3, 48, 25, 2)


def test_clip_fft_resume_from_pt(tmp_path):
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "o1")
    main(["-t", "abc", "--size", "48-48", "--steps", "1", "--samples", "2",
          "--out_dir", out, "--save_pt", "-nv", "--transform", "none"])
    pt = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".pt")][0]
    out2 = str(tmp_path / "o2")
    main(["-t", "abc", "--size", "48-48", "--steps", "1", "--samples", "2",
          "--out_dir", out2, "-nv", "--transform", "none", "-r", pt])
    assert any(f.endswith(".jpg") for f in os.listdir(out2))


def test_clip_fft_dwt(tmp_path):
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "dwt")
    main(["-t", "xyz", "--dwt", "-w", "db2", "--size", "48-48", "--steps", "1",
          "--samples", "2", "--out_dir", out, "-nv", "--transform", "none"])
    assert any(f.endswith(".jpg") for f in os.listdir(out))


def test_clip_fft_resume_from_image(tmp_path):
    from aphantasia_tpu.cli.clip_fft import main
    from imageio import imsave
    img = (np.random.RandomState(0).rand(48, 48, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "src.png")
    imsave(src, img)
    out = str(tmp_path / "res")
    main(["-t", "abc", "--size", "48-48", "--steps", "1", "--samples", "2",
          "--out_dir", out, "-nv", "--transform", "none", "-r", src])
    assert any(f.endswith(".jpg") for f in os.listdir(out))


def test_sample_budget_cascade():
    from aphantasia_tpu.cli.common import apply_sample_budget
    # clip_fft.py:125-127: ViT-B/16 x0.25; then fast transform x0.95
    assert apply_sample_budget(200, "ViT-B/16", transform="fast") == 47
    # dualmod x0.23 after base
    assert apply_sample_budget(200, "ViT-B/32", dualmod=2,
                               transform="none") == 46
    # enforce halves
    assert apply_sample_budget(200, "ViT-B/32", enforce=1.0,
                               transform="none") == 100


def test_parse_size():
    from aphantasia_tpu.cli.common import parse_size
    assert parse_size("1280-720") == [720, 1280]
    assert parse_size("512") == [512, 512]


def test_clip_fft_dualmod_tiny(tmp_path):
    """dualmod: both towers compiled into the chunked scan body, a lax.cond
    swaps them every Nth step (clip_fft.py:135 schedule)."""
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "outdm")
    main(["-t", "test prompt", "--size", "48-48", "--steps", "4",
          "--samples", "3", "--out_dir", out, "-nv",
          "--transform", "none", "--dualmod", "2"])
    run_dirs = [d for d in os.listdir(out)
                if os.path.isdir(os.path.join(out, d))]
    assert len(run_dirs) == 1 and "dm2" in run_dirs[0]
    frames = [f for f in os.listdir(os.path.join(out, run_dirs[0]))
              if f.endswith(".jpg")]
    assert len(frames) == 4


def test_depth_cli(tmp_path):
    """Standalone DA-V2 batch CLI (reference depth/any2/run.py, which
    ships broken imports — run.py:9-11): file-or-folder input, grayscale-x3
    uint8 PNGs at source resolution, full min-max range, shape-bucketed
    batched inference."""
    from imageio.v2 import imsave, imread
    from aphantasia_tpu.cli.depth import main, infer_dims
    rng = np.random.RandomState(0)
    src = tmp_path / "in"
    src.mkdir()
    imsave(str(src / "a.png"), (rng.rand(80, 120, 3) * 255).astype(np.uint8))
    imsave(str(src / "b.jpg"), (rng.rand(80, 120, 3) * 255).astype(np.uint8))
    imsave(str(src / "c.png"), (rng.rand(60, 60, 3) * 255).astype(np.uint8))
    out = tmp_path / "out"
    main(["-i", str(src), "-o", str(out), "--encoder", "vits", "-sz", "70"])
    names = sorted(os.listdir(out))
    assert names == ["a.png", "b.png", "c.png"]
    for n in names:
        im = imread(str(out / n))
        assert im.dtype == np.uint8 and im.shape[2] == 3
        assert im.min() == 0 and im.max() >= 248   # min-max normalized
        assert (im[:, :, 0] == im[:, :, 1]).all()  # grayscale x3
    assert imread(str(out / "a.png")).shape == (80, 120, 3)
    assert imread(str(out / "c.png")).shape == (60, 60, 3)
    # inference dims contract: short side >= size, multiples of 14
    h, w = infer_dims(80, 120, 70)
    assert h % 14 == 0 and w % 14 == 0 and min(h, w) >= 70 - 7
