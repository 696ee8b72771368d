"""Smoke tests: illustra and interpol CLIs on tiny configs."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)


def test_illustra_two_scenes(tmp_path):
    from aphantasia_tpu.cli.illustra import main
    txt = str(tmp_path / "lines.txt")
    with open(txt, "w") as f:
        f.write("first scene\n# comment\nsecond scene\n")
    out = str(tmp_path / "fft")
    main(["-t", txt, "--size", "48-48", "--steps", "2", "--samples", "2",
          "--out_dir", out, "-nv", "--transform", "none", "--lsteps", "3",
          "--aest", "0"])
    pts = [f for f in os.listdir(out) if f.endswith(".pt")]
    assert len(pts) == 2  # one snapshot per scene
    finals = os.listdir(os.path.join(out, "_final"))
    assert len([f for f in finals if f.endswith(".jpg")]) == 6  # 2 pts x 3 steps


def test_interpol(tmp_path):
    from aphantasia_tpu.cli.interpol import main
    from aphantasia_tpu.io.checkpoint import save_pt
    ptdir = str(tmp_path / "pt")
    os.makedirs(ptdir)
    rs = np.random.RandomState(0)
    for i in range(2):
        save_pt(os.path.join(ptdir, f"{i}.pt"),
                [rs.randn(1, 3, 32, 17, 2).astype(np.float32) * 0.01])
    out = str(tmp_path / "out")
    main(["-i", ptdir, "-o", out, "-s", "3", "-v", ""])
    frames = os.listdir(os.path.join(out, "a"))
    assert len([f for f in frames if f.endswith(".jpg")]) == 6


def test_illustra_dualmod_tiny(tmp_path):
    """dualmod through illustra's chunked loop (both towers in-graph)."""
    import os
    from aphantasia_tpu.cli.illustra import main
    out = str(tmp_path / "outdm")
    main(["-t", "test prompt", "--size", "48-48", "--steps", "4",
          "--save_step", "2", "--samples", "3", "--out_dir", out, "-nv",
          "--transform", "none", "--separate", "--dualmod", "2"])
    scene = [os.path.join(out, d) for d in os.listdir(out)
             if os.path.isdir(os.path.join(out, d))][0]
    frames = [f for f in os.listdir(scene) if f.endswith(".jpg")]
    assert len(frames) == 2
