"""Regression guard for the measured hot-path defaults.

Round 2's 3x headline regression (BENCH_r02: 7.64 it/s) happened because a
kernel became the transforms_fast default on a compile-only probe, without
a step-cost A/B.  Every default below is the winner of an on-chip A/B
recorded in docs/TPU_MEASUREMENTS_r3.md; flipping any of them must come
with a new recorded measurement (update the doc AND this test together).
"""
import os

import jax.numpy as jnp

from aphantasia_tpu.ops import augs
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.models.clip import model as clip_model


def test_fast_transform_defaults_to_affine_fit(monkeypatch):
    # exact-perspective kernel measured 7.7 vs 24.4 it/s (r3 A/B §1)
    monkeypatch.delenv("APHANTASIA_EXACT_PERSP", raising=False)
    assert augs.get_transform("fast") is augs.transforms_fast_affine


def test_exact_perspective_remains_available(monkeypatch):
    # ... but the torchvision-exact pipeline must stay one env var away
    monkeypatch.setenv("APHANTASIA_EXACT_PERSP", "1")
    from aphantasia_tpu.ops.pallas_persp import kernel_supported
    want = augs.transforms_fast if kernel_supported() else \
        augs.transforms_fast_affine
    assert augs.get_transform("fast") is want


def test_persp_cli_flag_maps_to_env(monkeypatch):
    """--persp affine|mixed|exact (r5) resolves to the env knob
    get_transform reads; the flag wins over a pre-set env var."""
    from aphantasia_tpu.cli.common import apply_persp

    class A:
        persp = None

    monkeypatch.setenv("APHANTASIA_EXACT_PERSP", "1")
    apply_persp(A())                       # no flag: env untouched
    assert os.environ["APHANTASIA_EXACT_PERSP"] == "1"
    A.persp = "affine"
    apply_persp(A())
    assert "APHANTASIA_EXACT_PERSP" not in os.environ
    A.persp = "mixed"
    apply_persp(A())
    assert os.environ["APHANTASIA_EXACT_PERSP"] == "mixed"
    A.persp = "exact"
    apply_persp(A())
    assert os.environ["APHANTASIA_EXACT_PERSP"] == "1"
    # every transform-using CLI exposes the flag
    from aphantasia_tpu.cli import (clip_fft, clip_vqgan, cppn, illustra,
                                    illustrip)
    for mod in (clip_fft, clip_vqgan, cppn, illustra, illustrip):
        a = mod.get_args(["-t", "x", "--persp", "mixed"])
        assert a.persp == "mixed", mod.__name__


def test_mixed_perspective_mode_selectable(monkeypatch):
    # the r5 ladder rung (exact persp + affine rotate, 17.5 it/s /
    # cosine 0.9997 — TPU_MEASUREMENTS_r5.md §1) selects via =mixed
    monkeypatch.setenv("APHANTASIA_EXACT_PERSP", "mixed")
    from aphantasia_tpu.ops.pallas_persp import kernel_supported
    want = augs.transforms_fast_mixed if kernel_supported() else \
        augs.transforms_fast_affine
    assert augs.get_transform("fast") is want


def test_fused_attention_default_on():
    # pallas_attn is the one kernel family that won its on-chip A/B.
    # Mesh-path CLI tests legitimately mutate the module global (the custom
    # call cannot be SPMD-partitioned), so assert the SHIPPED default from
    # the source, not the possibly-poked runtime value.
    import ast
    import inspect
    tree = ast.parse(inspect.getsource(clip_model))
    default = [node.value.value for node in ast.walk(tree)
               if isinstance(node, ast.Assign)
               and any(getattr(t, "id", None) == "FUSED_ATTN"
                       for t in node.targets)
               and isinstance(node.value, ast.Constant)]
    assert default == [True]
    # ... and the runtime gate only ever enables it on real TPU backends
    assert clip_model._fused_attn_active() in (False, True)  # smoke
    if clip_model.FUSED_ATTN:
        import jax
        want = jax.default_backend() in ("tpu", "axon")
        assert clip_model._fused_attn_active() is want


def test_pallas_cutout_default_off():
    # dense-matmul contraction beat the r2 Pallas kernel on-chip
    assert CutoutSampler((64, 96), 8).use_pallas is False


def test_fused_block_is_opt_in():
    # fused half-blocks measured 22.25 vs 24.45 it/s (r3 §3): opt-in only
    assert os.environ.get("APHANTASIA_FUSED_BLOCK") != "1"


def test_fft_decode_dtype_auto():
    # bf16 DFT decode with f32 accumulation: throughput-neutral at 720p
    # (24.84-25.00 vs 24.94 f32, r3 §6), halves decode HBM at 4K; parity
    # bounded in test_fft.py.  "auto" = bf16 on TPU only, f32 elsewhere.
    assert FFTParameterizer((64, 96)).compute_dtype == "auto"
    assert jnp.bfloat16  # keep the jnp import honest
