"""--mesh / --pallas / --profile on every CLI (VERDICT r1 items 6-7).

Runs each CLI at a tiny config on the 8-virtual-CPU platform with the
parallel flags engaged: data-parallel mesh, data x model (tensor-parallel
CLIP) mesh, the Pallas cutout kernel (interpret mode on CPU), and a
profiler trace capture.
"""
import glob
import os

import pytest

pytestmark = pytest.mark.slow

from aphantasia_tpu.cli import clip_fft, illustra, illustrip, cppn, clip_vqgan


def test_clip_fft_mesh_tp_pallas_profile(tmp_path):
    prof_dir = str(tmp_path / "trace")
    a = clip_fft.get_args([
        "-t", "test", "--size", "64-48", "--steps", "2", "--samples", "8",
        "--out_dir", str(tmp_path), "--mesh", "4x2", "--pallas",
        "--profile", prof_dir, "--transform", "none"])
    clip_fft.run(a)
    assert glob.glob(str(tmp_path / "*.mp4"))
    assert os.path.isdir(prof_dir) and os.listdir(prof_dir)  # trace captured


def test_clip_fft_mesh_dcn_single_process(tmp_path):
    """--mesh dcn (r5): with one process it degenerates to a data axis
    over all local devices — the CLI path that scales to a real
    multi-host run with --fleet R/W@coord (parallel/dcn.py)."""
    a = clip_fft.get_args([
        "-t", "test", "--size", "64-48", "--steps", "2", "--samples", "8",
        "--out_dir", str(tmp_path), "--mesh", "dcn",
        "--transform", "none"])
    clip_fft.run(a)
    assert glob.glob(str(tmp_path / "*.mp4"))


def test_illustra_mesh(tmp_path):
    a = illustra.get_args([
        "-t", str(_txt(tmp_path, "one line")), "--size", "64-48",
        "--steps", "2", "--samples", "8", "--lsteps", "2",
        "--out_dir", str(tmp_path), "--mesh", "4", "--transform", "none"])
    illustra.run(a)
    assert glob.glob(str(tmp_path / "*.mp4"))


def test_illustrip_mesh(tmp_path):
    a = illustrip.get_args([
        "-t", "tiny scene", "--size", "64-48", "--steps", "2",
        "--fstep", "2", "--opt_step", "1", "--samples", "8", "--gen", "FFT",
        "--out_dir", str(tmp_path), "--mesh", "2", "--transform", "none"])
    illustrip.run(a)
    assert glob.glob(str(tmp_path / "*/*.mp4")) or glob.glob(
        str(tmp_path / "*.mp4"))


def test_cppn_mesh_pallas(tmp_path):
    a = cppn.get_args([
        "-t", "test", "--size", "64-64", "--steps", "2", "--samples", "8",
        "--fstep", "1", "--out_dir", str(tmp_path), "--mesh", "4",
        "--pallas"])
    cppn.run(a)
    assert glob.glob(str(tmp_path / "cppn" / "*"))


def test_clip_vqgan_mesh(tmp_path):
    a = clip_vqgan.get_args([
        "-t", "test", "--size", "64-64", "--steps", "2", "--samples", "6",
        "--out_dir", str(tmp_path), "--mesh", "2", "--transform", "none"])
    clip_vqgan.run(a)
    assert glob.glob(str(tmp_path / "*.mp4"))


def _txt(tmp_path, content):
    p = tmp_path / "in.txt"
    p.write_text(content)
    return p
