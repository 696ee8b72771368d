"""Console progress bar unit tests (reference aphantasia/progress_bar.py
semantics: steps/s + ETA + finish wall-time line, VT100-free capture)."""
import io
import re
import sys

from aphantasia_tpu.progress import ProgressBar, ProgressIPy, get_progress_bar


def _capture_upd(bar, n=1, msg=None):
    buf = io.StringIO()
    old = sys.stderr
    sys.stderr = buf
    try:
        for _ in range(n):
            bar.upd(msg)
    finally:
        sys.stderr = old
    return buf.getvalue()


def test_bounded_bar_line_format():
    bar = ProgressBar(8)
    out = _capture_upd(bar, 2)
    last = out.split("\r")[-1]
    m = re.match(r" \[(>*-*)\] 2/8 ([0-9.]+) it/s  eta (\d\d:\d\d:\d\d)"
                 r"  fin (\d\d:\d\d:\d\d)", last)
    assert m, last
    assert len(m.group(1)) == 24          # fixed-width bar
    assert float(m.group(2)) > 0


def test_bar_completion_newline_and_fill():
    bar = ProgressBar(3)
    out = _capture_upd(bar, 3)
    assert out.endswith("\n")             # newline only at completion
    assert "[>>>>>>>>>>>>>>>>>>>>>>>>] 3/3" in out


def test_unbounded_bar_and_msg():
    bar = ProgressBar(0)
    out = _capture_upd(bar, 1, msg="hello")
    assert re.search(r" 1 done, [0-9.]+ it/s  hello", out), out


def test_reset_restarts_count():
    bar = ProgressBar(5)
    _capture_upd(bar, 4)
    bar.reset(count=2)
    assert bar.completed == 0 and bar.task_num == 2
    out = _capture_upd(bar, 2)
    assert "2/2" in out and out.endswith("\n")


def test_ipy_widget_or_console_fallback(monkeypatch, capsys):
    # with ipywidgets present the widget path must track progress values
    bar = ProgressIPy(2)
    if getattr(bar, "_widget", False):
        bar.upd()
        assert bar.progress.value == 1 and "1/2" in bar.label.value
    # simulate an env without ipywidgets: falls back to the console bar
    import builtins
    real_import = builtins.__import__

    def no_ipy(name, *a, **k):
        if name == "ipywidgets":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_ipy)
    bar2 = ProgressIPy(2)
    assert not bar2._widget
    out = _capture_upd(bar2, 1)
    assert "1/2" in out
    # and the probe selects the console bar outside IPython
    assert get_progress_bar() is ProgressBar
