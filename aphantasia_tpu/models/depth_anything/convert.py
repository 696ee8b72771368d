"""HF `AutoModelForDepthEstimation` (depth-anything V2) -> param pytree.

Maps the transformers DepthAnythingForDepthEstimation state_dict naming
(backbone.* Dinov2Model, neck.* DPT reassembly/fusion, head.* output convs)
onto the layout of models/depth_anything/{dinov2,dpt}.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    return np.asarray(getattr(x, "numpy", lambda: x)(), np.float32)


def _hwio(w):
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _hwio_t(w):
    # torch ConvTranspose2d weight [in, out, kh, kw] -> HWIO [kh,kw,in,out]
    return jnp.asarray(_np(w).transpose(2, 3, 0, 1))


def _load_hf_dir(path):
    """State dict from an HF model directory (safetensors or torch bin)."""
    import os
    st = os.path.join(path, "model.safetensors")
    if os.path.isfile(st):
        try:
            from safetensors.numpy import load_file
            return load_file(st)
        except ImportError:
            pass
    binp = os.path.join(path, "pytorch_model.bin")
    if os.path.isfile(binp):
        import torch
        return torch.load(binp, map_location="cpu")
    # fall back to instantiating the model (needs transformers + config)
    import transformers
    model = transformers.AutoModelForDepthEstimation.from_pretrained(path)
    return model.state_dict()


def convert_hf_dav2(path_or_sd):
    if isinstance(path_or_sd, str):
        import os
        if os.path.isdir(path_or_sd):
            # HF save_pretrained directory (what `transformers.AutoModel
            # ForDepthEstimation.from_pretrained` consumes — the reference's
            # load path, depth/depth.py:22-25): read the weight file inside
            sd = _load_hf_dir(path_or_sd)
        else:
            import torch
            sd = torch.load(path_or_sd, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
        sd = {k: _np(v) for k, v in sd.items()}
    elif hasattr(path_or_sd, "state_dict"):
        sd = {k: _np(v) for k, v in path_or_sd.state_dict().items()}
    else:
        sd = {k: _np(v) for k, v in path_or_sd.items()}

    def ln(prefix):
        return {"g": jnp.asarray(sd[prefix + ".weight"]),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    n_blocks = max(int(k.split(".")[3]) for k in sd
                   if k.startswith("backbone.encoder.layer.")) + 1
    blocks = []
    for i in range(n_blocks):
        p = f"backbone.encoder.layer.{i}"
        q = _np(sd[p + ".attention.attention.query.weight"])
        k_ = _np(sd[p + ".attention.attention.key.weight"])
        v = _np(sd[p + ".attention.attention.value.weight"])
        qb = _np(sd[p + ".attention.attention.query.bias"])
        kb = _np(sd[p + ".attention.attention.key.bias"])
        vb = _np(sd[p + ".attention.attention.value.bias"])
        blocks.append({
            "ln_1": ln(p + ".norm1"),
            "attn": {
                "qkv_w": jnp.asarray(np.concatenate([q, k_, v], 0).T),
                "qkv_b": jnp.asarray(np.concatenate([qb, kb, vb], 0)),
                "proj_w": jnp.asarray(_np(sd[p + ".attention.output.dense.weight"]).T),
                "proj_b": jnp.asarray(_np(sd[p + ".attention.output.dense.bias"])),
            },
            "ls1": jnp.asarray(_np(sd[p + ".layer_scale1.lambda1"])),
            "ln_2": ln(p + ".norm2"),
            "mlp": {
                "fc1_w": jnp.asarray(_np(sd[p + ".mlp.fc1.weight"]).T),
                "fc1_b": jnp.asarray(_np(sd[p + ".mlp.fc1.bias"])),
                "fc2_w": jnp.asarray(_np(sd[p + ".mlp.fc2.weight"]).T),
                "fc2_b": jnp.asarray(_np(sd[p + ".mlp.fc2.bias"])),
            },
            "ls2": jnp.asarray(_np(sd[p + ".layer_scale2.lambda1"])),
        })
    pw = _np(sd["backbone.embeddings.patch_embeddings.projection.weight"])
    backbone = {
        "patch_w": jnp.asarray(pw.reshape(pw.shape[0], -1).T),
        "patch_b": jnp.asarray(_np(sd["backbone.embeddings.patch_embeddings.projection.bias"])),
        "cls_token": jnp.asarray(_np(sd["backbone.embeddings.cls_token"])[0, 0]),
        "pos_emb": jnp.asarray(_np(sd["backbone.embeddings.position_embeddings"])[0]),
        "blocks": blocks,
    }
    # final layernorm, applied to every tapped intermediate layer
    # (reference get_intermediate_layers(norm=True) default /
    # HF apply_layernorm=true — see dinov2.py:dinov2_features)
    if "backbone.layernorm.weight" in sd:
        backbone["final_ln"] = ln("backbone.layernorm")

    proj_w, proj_b, scratch_w, fusion = [], [], [], []
    for i in range(4):
        proj_w.append(jnp.asarray(
            _np(sd[f"neck.reassemble_stage.layers.{i}.projection.weight"])[:, :, 0, 0].T))
        proj_b.append(jnp.asarray(
            _np(sd[f"neck.reassemble_stage.layers.{i}.projection.bias"])))
        scratch_w.append(_hwio(sd[f"neck.convs.{i}.weight"]))
        p = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "rcu1": {"conv1_w": _hwio(sd[p + ".residual_layer1.convolution1.weight"]),
                     "conv1_b": jnp.asarray(_np(sd[p + ".residual_layer1.convolution1.bias"])),
                     "conv2_w": _hwio(sd[p + ".residual_layer1.convolution2.weight"]),
                     "conv2_b": jnp.asarray(_np(sd[p + ".residual_layer1.convolution2.bias"]))},
            "rcu2": {"conv1_w": _hwio(sd[p + ".residual_layer2.convolution1.weight"]),
                     "conv1_b": jnp.asarray(_np(sd[p + ".residual_layer2.convolution1.bias"])),
                     "conv2_w": _hwio(sd[p + ".residual_layer2.convolution2.weight"]),
                     "conv2_b": jnp.asarray(_np(sd[p + ".residual_layer2.convolution2.bias"]))},
            "out_w": _hwio(sd[p + ".projection.weight"]),
            "out_b": jnp.asarray(_np(sd[p + ".projection.bias"])),
        })
    # HF fusion layers are ordered coarsest-first; ours index 0=finest
    fusion = fusion[::-1]

    head = {
        "proj_w": proj_w, "proj_b": proj_b,
        "up4_w": _hwio_t(sd["neck.reassemble_stage.layers.0.resize.weight"]),
        "up4_b": jnp.asarray(_np(sd["neck.reassemble_stage.layers.0.resize.bias"])),
        "up2_w": _hwio_t(sd["neck.reassemble_stage.layers.1.resize.weight"]),
        "up2_b": jnp.asarray(_np(sd["neck.reassemble_stage.layers.1.resize.bias"])),
        "down_w": _hwio(sd["neck.reassemble_stage.layers.3.resize.weight"]),
        "down_b": jnp.asarray(_np(sd["neck.reassemble_stage.layers.3.resize.bias"])),
        "scratch_w": scratch_w,
        "fusion": fusion,
        "out1_w": _hwio(sd["head.conv1.weight"]),
        "out1_b": jnp.asarray(_np(sd["head.conv1.bias"])),
        "out2_w": _hwio(sd["head.conv2.weight"]),
        "out2_b": jnp.asarray(_np(sd["head.conv2.bias"])),
        "out3_w": _hwio(sd["head.conv3.weight"]),
        "out3_b": jnp.asarray(_np(sd["head.conv3.bias"])),
    }
    return {"backbone": backbone, "head": head}
