"""VQGAN decoder tests: shapes, gradient flow, taming-checkpoint converter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.models.vqgan import (
    VQGANConfig, VQGAN_CONFIGS, vqgan_init, vqgan_decode, latent_init,
    VQGANParameterizer, convert_taming)

pytestmark = pytest.mark.slow  # integration tier (SURVEY.md §4)

TINY = VQGANConfig("tiny", z_channels=8, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=())


def test_decode_shape_and_range():
    params = vqgan_init(jax.random.PRNGKey(0), TINY)
    z = latent_init(jax.random.PRNGKey(1), TINY, (16, 24))
    assert z.shape == (1, 8, 8, 12)
    img = vqgan_decode(params, TINY, z)
    assert img.shape == (1, 3, 16, 24)
    assert float(img.min()) >= 0 and float(img.max()) <= 1


def test_decode_bf16_compute_close_to_f32():
    """The TPU default path (VQGANParameterizer compute_dtype='auto', r5)
    runs the decoder convs in bf16; bound its deviation against the f32
    decode on a full-size (gumbel-shaped) random decoder — same contract
    as the FFT bf16 decode bound (test_fft.py)."""
    cfg = VQGAN_CONFIGS["gumbel_f8_8192"]
    params = vqgan_init(jax.random.PRNGKey(2), cfg)
    z = latent_init(jax.random.PRNGKey(3), cfg, (64, 80))
    f32 = np.asarray(vqgan_decode(params, cfg, z, dtype=jnp.float32))
    bf16 = np.asarray(vqgan_decode(params, cfg, z, dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32          # output stays f32
    err = np.abs(bf16 - f32).mean() / (f32.std() + 1e-9)
    assert err < 0.05, err
    corr = np.corrcoef(bf16.ravel(), f32.ravel())[0, 1]
    assert corr > 0.995, corr


def test_f16_config_factor():
    assert VQGAN_CONFIGS["imagenet_f16_1024"].f == 16
    assert VQGAN_CONFIGS["gumbel_f8_8192"].f == 8


def test_gradient_flows_to_latents():
    params = vqgan_init(jax.random.PRNGKey(0), TINY)
    par = VQGANParameterizer((16, 16), TINY, params)
    z = par.init(jax.random.PRNGKey(2))

    def loss(zz):
        return jnp.sum(par.image(zz) ** 2)

    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def _tiny_taming_sd(seed=0):
    """Tiny taming-transformers decoder state_dict, named exactly like the
    real checkpoints (decoder.*, post_quant_conv.*) for TINY's config
    (z=8, ch=8, ch_mult=(1,2), 1 res block, no attn resolutions)."""
    rs = np.random.RandomState(seed)
    sd = {}

    def conv(prefix, cin, cout, k):
        sd[prefix + ".weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[prefix + ".bias"] = rs.randn(cout).astype(np.float32) * 0.01

    def norm(prefix, c):
        sd[prefix + ".weight"] = (1.0 + 0.1 * rs.randn(c)).astype(np.float32)
        sd[prefix + ".bias"] = rs.randn(c).astype(np.float32) * 0.01

    def res(prefix, cin, cout):
        norm(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout, 3)
        norm(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout, 3)
        if cin != cout:
            conv(prefix + ".nin_shortcut", cin, cout, 1)

    def attn(prefix, c):
        norm(prefix + ".norm", c)
        for nm in ("q", "k", "v"):
            conv(prefix + "." + nm, c, c, 1)
        conv(prefix + ".proj_out", c, c, 1)

    block_in = 8 * 2
    conv("post_quant_conv", 8, 8, 1)
    conv("decoder.conv_in", 8, block_in, 3)
    res("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in)
    # level 1 (coarsest, ch_mult=2): blocks + INTERLEAVED attns (the real
    # gumbel/f16 checkpoints carry attn.0..attn.nb at the coarsest level;
    # taming applies block[i] then attn[i]) + upsample; level 0: blocks
    res("decoder.up.1.block.0", block_in, 16)
    attn("decoder.up.1.attn.0", 16)
    res("decoder.up.1.block.1", 16, 16)
    attn("decoder.up.1.attn.1", 16)
    conv("decoder.up.1.upsample.conv", 16, 16, 3)
    res("decoder.up.0.block.0", 16, 8)
    res("decoder.up.0.block.1", 8, 8)
    norm("decoder.norm_out", 8)
    conv("decoder.conv_out", 8, 3, 3)
    return sd


def test_convert_taming_tiny():
    """Build a tiny torch decoder state_dict by name and convert."""
    pytest.importorskip("torch")
    sd = _tiny_taming_sd()
    params = convert_taming(sd, TINY)
    z = latent_init(jax.random.PRNGKey(3), TINY, (16, 16))
    img = vqgan_decode(params, TINY, z)
    assert img.shape == (1, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()


def _torch_taming_decode(sd, z_np, cfg):
    """The taming Decoder forward + notebook (x+1)/2, written out in torch
    (reference CLIP_VQGAN.ipynb cell 2: decode(quant) = decoder(quant) —
    NO post_quant_conv)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def conv(x, p, pad):
        return F.conv2d(x, t[p + ".weight"], t[p + ".bias"], padding=pad)

    def gn(x, p):
        c = x.shape[1]
        return F.group_norm(x, min(32, c), t[p + ".weight"], t[p + ".bias"],
                            eps=1e-6)

    def swish(x):
        return x * torch.sigmoid(x)

    def res(x, p):
        h = conv(swish(gn(x, p + ".norm1")), p + ".conv1", 1)
        h = conv(swish(gn(h, p + ".norm2")), p + ".conv2", 1)
        if p + ".nin_shortcut.weight" in t:
            x = conv(x, p + ".nin_shortcut", 0)
        return x + h

    def attn(x, p):
        n, c, h, w = x.shape
        hn = gn(x, p + ".norm")
        q = conv(hn, p + ".q", 0).reshape(n, c, h * w)
        k = conv(hn, p + ".k", 0).reshape(n, c, h * w)
        v = conv(hn, p + ".v", 0).reshape(n, c, h * w)
        w_ = torch.bmm(q.permute(0, 2, 1), k) * (c ** -0.5)
        w_ = torch.softmax(w_, dim=2)
        h_ = torch.bmm(v, w_.permute(0, 2, 1)).reshape(n, c, h, w)
        return x + conv(h_, p + ".proj_out", 0)

    x = torch.from_numpy(z_np)
    x = conv(x, "decoder.conv_in", 1)
    x = res(x, "decoder.mid.block_1")
    x = attn(x, "decoder.mid.attn_1")
    x = res(x, "decoder.mid.block_2")
    for level in reversed(range(len(cfg.ch_mult))):
        # taming Decoder.forward interleaves block[i] then attn[i]
        j = 0
        while f"decoder.up.{level}.block.{j}.norm1.weight" in sd:
            x = res(x, f"decoder.up.{level}.block.{j}")
            if f"decoder.up.{level}.attn.{j}.norm.weight" in sd:
                x = attn(x, f"decoder.up.{level}.attn.{j}")
            j += 1
        if level != 0:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = conv(x, f"decoder.up.{level}.upsample.conv", 1)
    x = conv(swish(gn(x, "decoder.norm_out")), "decoder.conv_out", 1)
    return torch.clamp((x + 1.0) / 2.0, 0.0, 1.0).numpy()


def test_vqgan_decode_matches_torch_mirror():
    """Golden: JAX decode vs a torch write-out of the taming Decoder."""
    pytest.importorskip("torch")
    sd = _tiny_taming_sd()
    params = convert_taming(sd, TINY)
    z = np.asarray(latent_init(jax.random.PRNGKey(4), TINY, (16, 16)),
                   np.float32)
    got = np.asarray(vqgan_decode(params, TINY, jnp.asarray(z)))
    want = _torch_taming_decode(sd, z, TINY)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_decode_ignores_post_quant_by_default():
    """Reference decode is decoder(quant) only (CLIP_VQGAN.ipynb cell 2) —
    perturbing post_quant weights must not change the default decode, and
    use_post_quant=True must."""
    sd = _tiny_taming_sd()
    params = convert_taming(sd, TINY)
    z = latent_init(jax.random.PRNGKey(5), TINY, (16, 16))
    base = np.asarray(vqgan_decode(params, TINY, z))

    import jax.tree_util as jtu
    poisoned = dict(params)
    poisoned["post_quant"] = jtu.tree_map(lambda x: x + 100.0,
                                          params["post_quant"])
    np.testing.assert_array_equal(
        base, np.asarray(vqgan_decode(poisoned, TINY, z)))
    with_pq = np.asarray(vqgan_decode(params, TINY, z, use_post_quant=True))
    assert np.abs(with_pq - base).max() > 1e-5


def test_latent_pt_portability(tmp_path):
    """Trained-latent .pt snapshots port to/from the reference notebook's
    `lats.lats` schema (a bare torch tensor [1,C,h,w])."""
    torch = pytest.importorskip("torch")
    from aphantasia_tpu.io.checkpoint import save_pt, load_pt

    z = np.asarray(latent_init(jax.random.PRNGKey(6), TINY, (16, 16)),
                   np.float32)
    # ours -> torch (the notebook resumes torch.load(path))
    ours = str(tmp_path / "ours.pt")
    save_pt(ours, z)
    z_t = torch.load(ours, map_location="cpu", weights_only=False)
    np.testing.assert_allclose(np.asarray(z_t), z, atol=0)
    # torch -> ours (CLI --resume path: load_pt, list unwrap, asarray)
    theirs = str(tmp_path / "theirs.pt")
    torch.save(torch.from_numpy(z), theirs)
    z_back = load_pt(theirs)
    if isinstance(z_back, list):
        z_back = z_back[0]
    np.testing.assert_allclose(np.asarray(z_back, np.float32), z, atol=0)
