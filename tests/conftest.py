"""Test configuration: force a virtual 8-device CPU platform before jax use.

Multi-chip sharding tests run on `--xla_force_host_platform_device_count=8`
(SURVEY.md §4 item 4).  Real-TPU runs happen only in bench.py / the driver.
NOTE: the container's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU)
at interpreter start, so we must override via jax.config as well.

Test tiers (pytest.ini markers):
  pytest -m "not slow"   unit tier, < 3 min (golden numerics, kernels, ops)
  pytest                 full suite incl. CLI/video/model integration (~15 min)
  pytest -m weights      opt-in real-checkpoint fidelity (needs APHANTASIA_*_PT)
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
