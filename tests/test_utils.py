"""Direct unit tests for the host-side utils (reference
aphantasia/utils.py misc + the illustrip helpers the reference left
undefined).  These were previously exercised only through the CLIs."""
import numpy as np

from aphantasia_tpu.utils import (txt_clean, intrl, minmax, save_cfg,
                                  read_text, pick_, old_torch)


def test_txt_clean_filename_safe():
    # reference utils.py:29-30 semantics: strip punctuation, underscores
    assert txt_clean("a dream, of: mountains!") == "a_dream_of_mountains"
    out = txt_clean('he said "hi" | bye\nnow')   # newline DELETED, not _
    assert out == "he_said_hi__byenow"
    assert '"' not in out and "|" not in out and " " not in out


def test_intrl_every_step_from_b():
    # dualmod interleave (reference utils.py:32-38): indices step, 2*step...
    a = ["a0", "a1", "a2", "a3", "a4", "a5"]
    b = ["b0", "b1", "b2", "b3", "b4", "b5"]
    got = intrl(list(a), b, step=2)
    assert got == ["a0", "a1", "b2", "a3", "b4", "a5"]
    got3 = intrl(list(a), b, step=3)
    assert got3 == ["a0", "a1", "a2", "b3", "a4", "a5"]


def test_minmax_no_torch_shadowing():
    # the reference's minmax shadowed `torch` with a bool (utils.py:128) —
    # ours takes any array-like and returns floats
    lo, hi = minmax(np.asarray([[3, -2], [7, 0]]))
    assert (lo, hi) == (-2.0, 7.0)


def test_read_text_file_and_literal(tmp_path):
    p = tmp_path / "scenes.txt"
    p.write_text("first scene\n# a comment\n\n  second scene  \n")
    texts = read_text(str(p))
    assert texts == ["first scene", "", "second scene"]
    assert read_text("just a prompt") == ["just a prompt"]


def test_pick_clamped_and_looped():
    xs = ["x", "y", "z"]
    assert pick_(xs, 1) == "y"
    assert pick_(xs, 99) == "z"          # clamped (illustra.py:153-157)
    assert pick_(xs, 4, loop=True) == "y"
    assert pick_([], 0) is None


def test_save_cfg_sorted_and_nested(tmp_path):
    save_cfg({"b": 1, "a": {"z": 2, "y": 3}}, str(tmp_path))
    text = (tmp_path / "config.txt").read_text()
    lines = [l.rstrip() for l in text.splitlines()]
    assert lines[0] == "a"               # sorted keys, nesting indented
    assert "   y: 3" in lines and "b: 1" in lines
    assert lines.index("b: 1") > lines.index("   z: 2")


def test_old_torch_is_false():
    assert old_torch() is False
