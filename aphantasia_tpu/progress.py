"""Console/IPython progress bar (reference aphantasia/progress_bar.py).

Shows steps/s, rate, ETA and projected finish wall-time; auto-selects the
ipywidgets variant inside notebooks (clip_fft.py:27-31 probe).
"""
from __future__ import annotations

import sys
import time


class ProgressBar:
    def __init__(self, task_num: int = 0):
        self.task_num = task_num
        self.completed = 0
        self.start = time.time()
        self.first = True

    def upd(self, msg=None, uprows: int = 0):
        self.completed += 1
        elapsed = time.time() - self.start + 1e-9
        fps = self.completed / elapsed
        if self.task_num > 0:
            remaining = (self.task_num - self.completed) / max(fps, 1e-9)
            eta = time.strftime("%H:%M:%S", time.gmtime(remaining))
            fin = time.strftime("%H:%M:%S",
                                time.localtime(time.time() + remaining))
            pct = self.completed / self.task_num
            bar_w = 24
            filled = int(bar_w * pct)
            bar = ">" * filled + "-" * (bar_w - filled)
            line = (f"\r [{bar}] {self.completed}/{self.task_num} "
                    f"{fps:.2f} it/s  eta {eta}  fin {fin}")
        else:
            line = f"\r {self.completed} done, {fps:.2f} it/s"
        if msg:
            line += f"  {msg}"
        sys.stderr.write(line)
        sys.stderr.flush()
        if self.completed == self.task_num:
            sys.stderr.write("\n")

    def reset(self, count=None):
        self.completed = 0
        self.start = time.time()
        if count is not None:
            self.task_num = count


class ProgressIPy(ProgressBar):
    """Notebook variant; falls back to the console bar when ipywidgets is
    unavailable."""

    def __init__(self, task_num: int = 0):
        super().__init__(task_num)
        try:
            import ipywidgets as ipy
            from IPython.display import display
            self.progress = ipy.IntProgress(min=0, max=task_num,
                                            bar_style="")
            self.label = ipy.HTML()
            self.box = ipy.HBox(children=[self.progress, self.label])
            display(self.box)
            self._widget = True
        except Exception:
            self._widget = False

    def upd(self, msg=None, uprows: int = 0):
        if not getattr(self, "_widget", False):
            return super().upd(msg, uprows)
        self.completed += 1
        elapsed = time.time() - self.start + 1e-9
        fps = self.completed / elapsed
        self.progress.value = self.completed
        self.label.value = f"{self.completed}/{self.task_num} {fps:.2f} it/s"


def get_progress_bar():
    """Notebook probe (clip_fft.py:27-31)."""
    try:
        get_ipython().__class__.__name__  # noqa: F821
        return ProgressIPy
    except NameError:
        return ProgressBar
