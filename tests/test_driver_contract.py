"""Driver-contract guards: the two surfaces the build driver invokes on
every round must never silently break.

* bench.py prints ONE parseable JSON line with the {metric, value, unit}
  schema (BENCH_r* artifact) — exercised here through the real main() on
  the CPU-fallback config.
* __graft_entry__.entry() returns a jittable (fn, example_args) whose
  forward compiles and yields a finite scalar loss.

(dryrun_multichip is exercised by tests/test_multihost.py's DCN tests +
the driver itself; keeping it out of CI bounds suite runtime.)
"""
import io
import json
import contextlib
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_line_schema():
    sys.path.insert(0, _ROOT)
    try:
        import bench
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
    finally:
        sys.path.remove(_ROOT)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, lines          # ONE line — the driver contract
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit"} <= set(rec)
    assert rec["unit"] == "it/s"
    assert rec["value"] > 0 and np.isfinite(rec["value"])


def test_graft_entry_forward_compiles():
    import jax
    sys.path.insert(0, _ROOT)
    try:
        import __graft_entry__
        fn, args = __graft_entry__.entry()
    finally:
        sys.path.remove(_ROOT)
    loss = jax.jit(fn)(*args)
    assert loss.shape == ()
    assert bool(np.isfinite(np.asarray(loss)))
