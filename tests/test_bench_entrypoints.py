"""Keep the r5 entry-point bench runnable (scripts/bench_entrypoints.py
— the provenance for TPU_MEASUREMENTS_r5.md §4 and bench.py's cppn
field).  One family per generator class at the tiny CPU configs; the
interpol family doubles as a build_shift_render_loop smoke."""
import os
import sys

import pytest

pytestmark = pytest.mark.slow

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


@pytest.mark.parametrize("family", ["cppn", "interpol"])
def test_bench_entrypoints_family_runs(family):
    sys.path.insert(0, _SCRIPTS)
    try:
        import bench_entrypoints as be
        out = be.FAMILIES[family](False)   # on_tpu=False -> tiny config
    finally:
        sys.path.remove(_SCRIPTS)
    rate = out.get("it_s", out.get("f_min"))
    assert rate is not None and rate > 0, out
    assert "config" in out
