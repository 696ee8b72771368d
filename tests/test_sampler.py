"""Cutout sampler tests: bicubic/crop parity vs torch F.interpolate, tiling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.resize import resize_bicubic
from aphantasia_tpu.ops.sampler import CutoutSampler, Boxes
from aphantasia_tpu.ops.tile import tile_axis_map, pad_up_to

torch = pytest.importorskip("torch")
import torch.nn.functional as F


@pytest.mark.slow
def test_resize_bicubic_matches_torch():
    rs = np.random.RandomState(0)
    img = rs.rand(1, 3, 37, 53).astype(np.float32)
    for size in [(24, 24), (64, 80), (37, 53)]:
        got = np.asarray(resize_bicubic(jnp.asarray(img), size))
        want = F.interpolate(torch.from_numpy(img), size, mode="bicubic",
                             align_corners=True).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_cuts(img_np, boxes, modsize, y_map, x_map):
    """Reference crop+resize math (utils.py:239-253) on the padded frame."""
    img = torch.from_numpy(img_np)[None]
    padded = img[:, :, torch.from_numpy(y_map.astype(np.int64))[:, None],
                 torch.from_numpy(x_map.astype(np.int64))[None, :]]
    cuts = []
    for cs, ox, oy in zip(*[np.asarray(b) for b in boxes]):
        cut = padded[:, :, oy:oy + cs, ox:ox + cs]
        cut = F.interpolate(cut, (modsize, modsize), mode="bicubic",
                            align_corners=True)
        cuts.append(cut)
    return torch.cat(cuts, 0).numpy()


@pytest.mark.parametrize("align", ["uniform", "central", "overscan", "overmax"])
def test_cutouts_match_torch(align):
    rs = np.random.RandomState(1)
    h, w, m, s = 60, 90, 32, 7
    img = rs.rand(3, h, w).astype(np.float32)
    sampler = CutoutSampler((h, w), count=s, modsize=m, align=align, macro=0.4)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(7))
    got = np.asarray(sampler.cut(jnp.asarray(img), boxes))
    y_map, x_map = sampler.index_maps
    want = _torch_cuts(img, boxes, m, y_map, x_map)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_box_ranges():
    h, w, s = 64, 96, 64
    sampler = CutoutSampler((h, w), count=s, modsize=32, align="uniform", macro=0.5)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(0))
    cs, ox, oy = map(np.asarray, boxes)
    assert (cs >= 32 * 0.9).all() and (cs <= min(h, w)).all()
    assert (ox >= 0).all() and (ox + cs <= w).all()
    assert (oy >= 0).all() and (oy + cs <= h).all()


def test_chunked_equals_unchunked():
    rs = np.random.RandomState(2)
    img = rs.rand(3, 40, 40).astype(np.float32)
    s1 = CutoutSampler((40, 40), count=10, modsize=16, chunk=0)
    s2 = CutoutSampler((40, 40), count=10, modsize=16, chunk=4)
    boxes = s1.sample_boxes(jax.random.PRNGKey(3))
    a = np.asarray(s1.cut(jnp.asarray(img), boxes))
    b = np.asarray(s2.cut(jnp.asarray(img), boxes))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_tile_axis_map_repeating():
    m = tile_axis_map(4, 3, 5)  # pad 3 before, 5 after
    assert list(m) == [1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3, 0]


def test_tile_axis_map_symmetric():
    m = tile_axis_map(4, 2, 2, symm=True)
    # triangular reflection around -0.5 / 3.5
    assert len(m) == 8
    assert list(m[2:6]) == [0, 1, 2, 3]


def test_pad_up_to_matches_torch_reference_semantics():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.rand(1, 3, 6, 8).astype(np.float32))
    y = pad_up_to(x, (9, 12), type="centr")
    assert y.shape == (1, 3, 9, 12)
    # center region must be the source
    np.testing.assert_allclose(np.asarray(y[:, :, 1:7, 2:10]), np.asarray(x))


def test_cut_gradient_flows_to_image():
    img = jnp.ones((3, 32, 32))
    sampler = CutoutSampler((32, 32), count=4, modsize=16)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(0))

    def loss(im):
        return jnp.sum(sampler.cut(im, boxes) ** 2)

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_pallas_cutout_matches_xla():
    """Pallas kernel (interpret mode on CPU) vs the XLA einsum path."""
    import dataclasses
    rs = np.random.RandomState(9)
    img = jnp.asarray(rs.rand(3, 48, 64).astype(np.float32))
    sx = CutoutSampler((48, 64), count=5, modsize=16)
    sp = dataclasses.replace(sx, use_pallas=True)
    boxes = sx.sample_boxes(jax.random.PRNGKey(2))
    a = np.asarray(sx.cut(img, boxes))
    b = np.asarray(sp.cut(img, boxes))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-2)  # bf16 kernel

    ga = jax.grad(lambda im: jnp.sum(sx.cut(im, boxes) ** 2))(img)
    gb = jax.grad(lambda im: jnp.sum(sp.cut(im, boxes) ** 2))(img)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=5e-2,
                               atol=5e-2)


def test_contract_branch_transpose_invariance():
    """The H-first / W-first einsum orders (sampler._contract picks by
    `H < W`) must be numerically interchangeable: cutting a transposed
    frame with swapped boxes/taps lands on the OTHER branch and must give
    transposed cutouts and transposed image gradients.  Guards the seam
    where round 3's square-canvas layout regression lived (the branch
    predicate flipped square frames onto the W-first order; see
    docs/TPU_MEASUREMENTS_r3.md section 5)."""
    from aphantasia_tpu.ops.sampler import _contract
    rs = np.random.RandomState(11)
    for h, w in [(48, 48), (64, 40), (40, 64)]:
        img = jnp.asarray(rs.rand(3, h, w).astype(np.float32))
        wy = jnp.asarray(rs.rand(5, 16, h).astype(np.float32))
        wx = jnp.asarray(rs.rand(5, 16, w).astype(np.float32))
        a = np.asarray(_contract(img, wy, wx, "float32"))
        b = np.asarray(_contract(jnp.swapaxes(img, 1, 2), wx, wy, "float32"))
        np.testing.assert_allclose(a, np.swapaxes(b, 2, 3), rtol=1e-5,
                                   atol=1e-5)
        ga = jax.grad(lambda im: jnp.sum(
            _contract(im, wy, wx, "float32") ** 2))(img)
        gb = jax.grad(lambda im: jnp.sum(
            _contract(im, wx, wy, "float32") ** 2))(jnp.swapaxes(img, 1, 2))
        np.testing.assert_allclose(np.asarray(ga),
                                   np.swapaxes(np.asarray(gb), 1, 2),
                                   rtol=1e-5, atol=1e-5)


def test_windowed_cut_matches_dense(monkeypatch):
    """Windowed Pallas forward (ops/pallas_cutout_win.py) == dense
    contraction, fwd + grad, across all three csize tiers (r4)."""
    import dataclasses
    import jax
    from aphantasia_tpu.ops.pallas_cutout_win import tier_plan

    h, w = 96, 160
    s, m = 12, 32
    sampler = CutoutSampler((h, w), s, m, align="uniform", macro=0.4)
    img = jax.random.normal(jax.random.PRNGKey(5), (3, h, w))
    boxes = sampler.sample_boxes(jax.random.PRNGKey(6))
    # make sure the draw covers more than one tier
    plan = tier_plan(h, w, m)
    cs = np.asarray(boxes.csize)
    assert (cs <= plan[0][0]).any() and (cs > plan[0][0]).any()

    ref = np.asarray(sampler.cut(img, boxes))
    co = jax.random.normal(jax.random.PRNGKey(7), ref.shape)
    g_ref = jax.grad(lambda x: jnp.sum(sampler.cut(x, boxes) * co))(img)

    monkeypatch.setenv("APHANTASIA_WIN_CUTOUT", "1")
    got = np.asarray(jax.jit(lambda x: sampler.cut(x, boxes))(img))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    g_got = jax.jit(jax.grad(
        lambda x: jnp.sum(sampler.cut(x, boxes) * co)))(img)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=2e-5, rtol=1e-4)


def test_windowed_bases_cover_all_taps():
    """Property tripwire for the windowed kernel's coverage proof: for
    every drawn box, EVERY bicubic tap index lands inside the sample's
    tier window after rebasing (otherwise the kernel's sliced weights
    would silently drop mass)."""
    import jax
    from aphantasia_tpu.ops.pallas_cutout_win import window_bases, tier_plan

    for seed, (h, w) in [(0, (96, 160)), (1, (720, 1280)), (2, (64, 64))]:
        m = 32 if min(h, w) < 200 else 224
        sampler = CutoutSampler((h, w), 64, m, align="uniform", macro=0.4)
        boxes = sampler.sample_boxes(jax.random.PRNGKey(seed))
        yidx, _, xidx, _ = sampler.tap_indices(boxes)
        tier, rb, cb = window_bases(boxes, h, w, m)
        plan = tier_plan(h, w, m)
        k_h = np.asarray([p[1] for p in plan])[np.asarray(tier)]
        k_w = np.asarray([p[2] for p in plan])[np.asarray(tier)]
        yloc = np.asarray(yidx) - np.asarray(rb)[:, None, None]
        xloc = np.asarray(xidx) - np.asarray(cb)[:, None, None]
        assert (yloc >= 0).all() and (yloc < k_h[:, None, None]).all(), (h, w)
        assert (xloc >= 0).all() and (xloc < k_w[:, None, None]).all(), (h, w)
