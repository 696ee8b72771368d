"""Notebook UI parity (VERDICT r1 item 10): the notebooks must stay
executable end-to-end (`jupyter nbconvert --execute` on tiny defaults)."""
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

NB_DIR = os.path.join(os.path.dirname(__file__), "..", "notebooks")


@pytest.mark.parametrize("name", ["Aphantasia", "CLIP_VQGAN"])
def test_notebook_executes(name, tmp_path):
    pytest.importorskip("nbconvert")
    src = os.path.join(NB_DIR, f"{name}.ipynb")
    dst = tmp_path / f"{name}.ipynb"
    shutil.copy(src, dst)
    # notebooks prepend '..' to sys.path — run from a dir whose parent
    # contains the package
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.abspath(os.path.join(NB_DIR, "..")))
    out = subprocess.run(
        [sys.executable, "-m", "nbconvert", "--to", "notebook",
         "--execute", "--inplace", str(dst)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
