"""Unit tier for ops/augs.py — every named pipeline (incl. the legacy
lucent/openai ones, reference transforms.py:118-143) must jit-compile at a
CLIP-shaped input, and the legacy pipelines' fixed-shape pad emulation must
satisfy basic invariances.  Numerical parity vs the reference is NOT the
contract here: the legacy pipelines are re-designed (per-sample draws, one
composed affine, appended normalize) because the reference versions are
unusable as-is (`pad` grows the tensor past CLIP's input size — latent-bug
list, SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.augs import get_transform, normalize_only

ALL_NAMES = ["fast", "custom", "elastic", "lucent", "openai", "none"]


@pytest.mark.parametrize("name", ALL_NAMES)
def test_transform_jits_and_is_finite(name):
    key = jax.random.PRNGKey(7)
    cuts = jax.random.uniform(key, (4, 3, 64, 64))
    out = jax.jit(get_transform(name))(key, cuts)
    assert out.shape == cuts.shape
    assert bool(jnp.isfinite(out).all())


def test_transforms_fast_mixed_jits_and_is_finite():
    """The r5 mixed pipeline (exact Pallas persp + affine rotate) runs in
    interpret mode on CPU and preserves shape/finiteness."""
    from aphantasia_tpu.ops.augs import transforms_fast_mixed
    key = jax.random.PRNGKey(7)
    cuts = jax.random.uniform(key, (4, 3, 64, 64))
    out = jax.jit(transforms_fast_mixed)(key, cuts)
    assert out.shape == cuts.shape
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("name", ["lucent", "openai"])
def test_legacy_gray_fill_invariance(name):
    """A constant-0.5 image warped with fill=0.5 is still constant 0.5, so
    the whole pipeline must equal plain clip_normalize on it — pins the
    pad-emulation + fill plumbing (bf16 warp tolerance)."""
    key = jax.random.PRNGKey(3)
    cuts = jnp.full((2, 3, 64, 64), 0.5)
    got = get_transform(name)(key, cuts)
    want = normalize_only(key, cuts)
    assert float(jnp.abs(got - want).max()) < 2e-2


@pytest.mark.parametrize("name", ["lucent", "openai"])
def test_legacy_per_sample_draws(name):
    """Each sample draws its own augmentation parameters (repo design —
    the reference draws once per batch): identical input rows must come
    out different."""
    key = jax.random.PRNGKey(11)
    one = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    cuts = jnp.tile(one, (4, 1, 1, 1))
    out = np.asarray(get_transform(name)(key, cuts))
    diffs = [np.abs(out[i] - out[0]).max() for i in range(1, 4)]
    assert max(diffs) > 1e-3, diffs


@pytest.mark.parametrize("name,thresh", [("lucent", 0.8), ("openai", 0.45)])
def test_legacy_content_preserved(name, thresh):
    """At the REAL 224 input size (the pixel-unit pads/jitters are sized
    for it), the center crop must stay correlated with the unaugmented
    normalize — the pipeline augments, it does not destroy.  openai's
    bound is lower by design: ten composed jitter(4) draws (mean 15 px)
    plus ±20° rotation is the strongest pipeline in the menu.  Measured
    2026-08-17 with this key: lucent 0.95, openai 0.65."""
    key = jax.random.PRNGKey(5)
    coarse = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 5, 5))
    cuts = jax.image.resize(coarse, (2, 3, 224, 224), "cubic")
    got = np.asarray(get_transform(name)(key, cuts))
    ref = np.asarray(normalize_only(key, cuts))
    sl = slice(56, 168)
    a = got[:, :, sl, sl].ravel()
    b = ref[:, :, sl, sl].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > thresh, corr
