"""illustrip CLI smoke tests: RGB and FFT generation, motion, crossfade."""
import os

import pytest

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)


def _run(tmp_path, extra):
    from aphantasia_tpu.cli.illustrip import main
    out = str(tmp_path / "out")
    main(["-t", "tiny scene", "--size", "48-48", "--steps", "2",
          "--samples", "2", "--out_dir", out, "-nv", "--transform", "none",
          "--fstep", "2", "--noise", "0"] + extra)
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = os.listdir(os.path.join(work, "ttt"))
    assert len([f for f in frames if f.endswith(".jpg")]) == 2
    assert os.path.isfile(os.path.join(work, "config.txt"))


def test_illustrip_rgb(tmp_path):
    _run(tmp_path, ["--gen", "RGB"])


def test_illustrip_fft(tmp_path):
    _run(tmp_path, ["--gen", "FFT"])


def test_illustrip_fft_smooth_noise(tmp_path):
    _run(tmp_path, ["--gen", "FFT", "-sm", "--noise", "1.0"])


def test_illustrip_two_scenes_interpol(tmp_path):
    from aphantasia_tpu.cli.illustrip import main, get_encs
    import jax.numpy as jnp
    # get_encs crossfade: weights ramp between consecutive scenes
    e = [(jnp.ones((1, 4)), jnp.ones((1,))), (jnp.ones((1, 4)), jnp.ones((1,)))]
    sched = get_encs(e, 0, 4)
    assert len(sched) == 4
    # first step: scene0 weight 1.0, scene1 weight 0
    assert float(sched[0][0][1][0]) == 1.0
    assert float(sched[0][1][1][0]) == 0.0
    # later steps ramp
    assert float(sched[3][1][1][0]) == pytest.approx(0.75)

    out = str(tmp_path / "out2")
    txt = str(tmp_path / "scenes.txt")
    with open(txt, "w") as f:
        f.write("scene one\nscene two\n")
    main(["-t", txt, "--size", "48-48", "--steps", "2", "--samples", "2",
          "--out_dir", out, "-nv", "--transform", "none", "--gen", "RGB",
          "--fstep", "2"])
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = [f for f in os.listdir(os.path.join(work, "ttt"))
              if f.endswith(".jpg")]
    assert len(frames) == 4  # 2 scenes x 2 steps


def test_illustrip_depth_tiny(tmp_path):
    """Depth-warped motion with a random tiny DAV2 (slow-ish but CPU-safe)."""
    from aphantasia_tpu.cli.illustrip import main
    out = str(tmp_path / "outd")
    main(["-t", "deep", "--size", "56-56", "--steps", "1", "--samples", "2",
          "--out_dir", out, "-nv", "--transform", "none", "--gen", "RGB",
          "--depth", "1.0", "--depth_model", "s", "--fstep", "1"])
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = [f for f in os.listdir(os.path.join(work, "ttt"))
              if f.endswith(".jpg")]
    assert len(frames) == 1


def test_illustrip_depth_dir_dump(tmp_path):
    """--depth_dir dumps one depth-map JPEG per frame alongside the render
    (reference depth/depth.py:78-80), on the fused path."""
    from aphantasia_tpu.cli.illustrip import main
    out = str(tmp_path / "outdd")
    ddir = str(tmp_path / "dmaps")
    main(["-t", "deep", "--size", "56-56", "--steps", "2", "--samples", "2",
          "--out_dir", out, "-nv", "--transform", "none", "--gen", "RGB",
          "--depth", "1.0", "--depth_model", "s", "--fstep", "2",
          "--depth_dir", ddir])
    import os
    dumps = [f for f in os.listdir(ddir) if f.endswith(".jpg")]
    assert len(dumps) == 2
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = [f for f in os.listdir(os.path.join(work, "ttt"))
              if f.endswith(".jpg")]
    assert len(frames) == 2
