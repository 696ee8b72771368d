"""Tests for the tracing/profiling utilities (SURVEY.md §5 — subsystems
the reference lacks entirely)."""
import glob
import re

from aphantasia_tpu.profiling import PhaseTimers, trace


def test_phase_timers_accumulate_and_report():
    t = PhaseTimers()
    for _ in range(3):
        with t.phase("decode"):
            pass
    with t.phase("encode"):
        pass
    assert t.counts["decode"] == 3 and t.counts["encode"] == 1
    assert t.totals["decode"] >= 0.0
    rep = t.report()
    assert re.search(r"decode\s+[0-9.]+s total\s+[0-9.]+ ms/call  x3", rep)
    assert "encode" in rep


def test_phase_timer_records_on_exception():
    t = PhaseTimers()
    try:
        with t.phase("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert t.counts["boom"] == 1


def test_trace_noop_without_dir():
    with trace(None):
        pass
    with trace(""):
        pass


def test_trace_writes_xplane(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    with trace(str(tmp_path)):
        jnp.ones((8,)).sum().block_until_ready()
    assert glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
