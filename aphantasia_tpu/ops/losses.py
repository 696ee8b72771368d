"""Similarity functions, sharpness losses, aesthetic head.

Parity: reference aphantasia/utils.py:256-295 (`derivat`, `dot_compare`,
`sim_func`) and utils.py:400-413 (LAION aesthetic head).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def cossim(v1, v2, eps=1e-8):
    """torch.cosine_similarity(dim=-1) semantics incl. eps clamp."""
    n1 = jnp.maximum(jnp.linalg.norm(v1, axis=-1), eps)
    n2 = jnp.maximum(jnp.linalg.norm(v2, axis=-1), eps)
    return jnp.sum(v1 * v2, axis=-1) / (n1 * n2)


def dot_compare(v1, v2, cossim_pow=0):
    """utils.py:270-274."""
    dot = jnp.sum(v1 * v2)
    mag = jnp.sqrt(jnp.sum(v2 ** 2))
    cs = dot / (1e-6 + mag)
    return dot * cs ** cossim_pow


def _normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def sim_func(v1, v2, type: str | None = None):
    """Similarity menu (utils.py:276-295): cossim (default) / dot / angular /
    spherical / mix = cossim - 0.25*spherical."""
    if type is not None and "mix" in type:
        coss = cossim(v1, v2).mean()
        a = _normalize(v1)
        b = _normalize(v2)
        spher = jnp.abs(
            2.0 * jnp.arcsin(jnp.linalg.norm(a - b, axis=-1) / 2.0) ** 2).mean()
        return coss - 0.25 * spher
    if type is not None and "spher" in type:
        a = _normalize(v1)
        b = _normalize(v2)
        return 2.0 * jnp.arcsin(jnp.linalg.norm(a - b, axis=-1) / 2.0) ** 2
    if type is not None and "ang" in type:
        cs = jnp.clip(cossim(v1, v2), -1.0, 1.0)
        return 1.0 - jnp.arccos(cs).mean() / np.pi
    if type is not None and "dot" in type:
        return dot_compare(v1, v2, cossim_pow=1)
    return cossim(v1, v2).mean()


# Scharr kernel pair (utils.py:259), applied over all 3 channels
_SCHARR = np.asarray(
    [[[-0.183, 0.0, 0.183], [-0.634, 0.0, 0.634], [-0.183, 0.0, 0.183]],
     [[-0.183, -0.634, -0.183], [0.0, 0.0, 0.0], [0.183, 0.634, 0.183]]],
    dtype=np.float32)

# Sobel kernels, kornia-normalized (divided by weight sum 8)
_SOBEL = np.asarray(
    [[[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
     [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]], dtype=np.float32) / 8.0


def derivat(img, mode: str = "sobel"):
    """Sharpness measure (utils.py:256-268): 'naiv' finite differences,
    'scharr' conv, 'sobel' (kornia spatial_gradient equivalent)."""
    if mode == "scharr":
        k = jnp.asarray(_SCHARR)[:, None].repeat(3, axis=1)  # [2,3,3,3] OIHW
        out = jax.lax.conv_general_dilated(
            img, jnp.transpose(k, (2, 3, 1, 0)), (1, 1), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        return 0.2 * jnp.mean(jnp.abs(out))
    if mode == "sobel":
        b, c, h, w = img.shape
        x = img.reshape(b * c, 1, h, w)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
        k = jnp.asarray(_SOBEL).transpose(1, 2, 0)[:, :, None, :]  # HWIO [3,3,1,2]
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NCHW", "HWIO", "NCHW"))
        return jnp.mean(jnp.abs(out))
    # 'naiv' finite differences
    dx = jnp.mean(jnp.abs(img[:, :, :, 1:] - img[:, :, :, :-1]))
    dy = jnp.mean(jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :]))
    return 0.5 * (dx + dy)


# ------------------------------------------------------------------ aesthetic

def aesthetic_dims(clip_model: str) -> int | None:
    """Embedding width of the LAION aesthetic linear head (utils.py:402-403)."""
    return (768 if clip_model == "ViT-L/14"
            else 512 if clip_model in ("ViT-B/16", "ViT-B/32") else None)


def aesthetic_init(key, clip_model: str = "ViT-B/32"):
    """Random-init head (hermetic fallback). Real weights load via
    `aesthetic_load` from the LAION sa_0_4_*_linear.pth checkpoint."""
    nf = aesthetic_dims(clip_model)
    if nf is None:
        return None
    kw, kb = jax.random.split(key)
    return {"w": 0.01 * jax.random.normal(kw, (nf, 1)),
            "b": jnp.zeros((1,))}


def aesthetic_get(key, clip_model: str = "ViT-B/32", path: str | None = None):
    """Aesthetic head with the standard resolution order: explicit path ->
    APHANTASIA_AEST_PT env -> LOUD random fallback.  All CLIs route here."""
    from aphantasia_tpu.weights import env_weights, warn_random

    if aesthetic_dims(clip_model) is None:
        return None
    path = env_weights("aesthetic", path)
    if path:
        return aesthetic_load(path)
    warn_random(f"aesthetic head ({clip_model})")
    return aesthetic_init(key, clip_model)


def aesthetic_load(path: str):
    """Convert a torch Linear(nf,1) state_dict checkpoint."""
    try:
        import torch
        sd = torch.load(path, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd.items()}
    except ImportError:
        from aphantasia_tpu.io.checkpoint import load_pt
        sd = {k: np.asarray(v, np.float32) for k, v in load_pt(path).items()}
    return {"w": jnp.asarray(sd["weight"].T), "b": jnp.asarray(sd["bias"])}


def aesthetic_apply(params, embeddings):
    """head(out_enc).mean() term input (clip_fft.py:255-256)."""
    return embeddings @ params["w"] + params["b"]
