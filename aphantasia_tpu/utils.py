"""Small host-side utilities (reference aphantasia/utils.py misc)."""
from __future__ import annotations

import collections.abc
import os


def txt_clean(txt: str) -> str:
    """Filename-safe prompt text (utils.py:29-30)."""
    table = str.maketrans(dict.fromkeys(list("\n',.—|!?/:;\\"), ""))
    return txt.translate(table).replace(" ", "_").replace('"', "")


def intrl(a: list, b: list, step: int = 2) -> list:
    """Interleave every `step`-th element of b into a (utils.py:32-38)."""
    assert len(a) == len(b), f" diff lengths: {len(a)} {len(b)}"
    assert step > 1
    for num in list(range(len(a)))[step::step]:
        a[num] = b[num]
    return a


def minmax(x) -> tuple:
    """Value range of an array (fixes the reference's torch-shadowing bug,
    utils.py:128-135)."""
    import numpy as np
    x = np.asarray(x)
    return (float(x.min()), float(x.max()))


def save_cfg(args, dir: str = "./", file: str | None = "config.txt"):
    """Dump sorted run config (utils.py:102-111)."""
    if dir != "":
        os.makedirs(dir, exist_ok=True)
    try:
        args = vars(args)
    except TypeError:
        pass
    if file is None:
        print_dict(args)
    else:
        with open(os.path.join(dir, file), "w") as cfg_file:
            print_dict(args, cfg_file)


def print_dict(d, file=None, path="", indent=""):
    for k in sorted(d.keys()):
        if isinstance(d[k], collections.abc.Mapping):
            line = indent + str(k)
            print(line) if file is None else file.write(line + " \n")
            print_dict(d[k], file, k if path == "" else f"{path}->{k}",
                       indent + "   ")
        else:
            line = f"{indent}{k}: {d[k]}"
            print(line) if file is None else file.write(line + " \n")


def read_text(in_txt: str) -> list:
    """Text input: literal string or line-per-scene file with '#' comments
    (illustrip.py:201-211)."""
    if os.path.isfile(in_txt):
        with open(in_txt, "r", encoding="utf-8") as f:
            lines = f.read().splitlines()
        texts = []
        for tt in lines:
            if len(tt.strip()) == 0:
                texts.append("")
            elif tt.strip()[0] != "#":
                texts.append(tt.strip())
    else:
        texts = [in_txt]
    return texts


def pick_(list_, num_, loop: bool = False):
    """Clamped/looped list indexing (illustra.py:153-157; also fixes the
    undefined pick_ in the reference illustrip.py:224)."""
    cnt = len(list_)
    if cnt == 0:
        return None
    num = num_ % cnt if loop else min(num_, cnt - 1)
    return list_[num]


def old_torch() -> bool:
    """Reference compat shim — always False (we target no torch runtime)."""
    return False
