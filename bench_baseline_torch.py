"""Measured baseline anchor: the reference's hot loop, mirrored in torch-CPU.

The reference (eps696/aphantasia) publishes no performance numbers and needs
a CUDA GPU + pip packages (clip, torchvision, kornia) that do not exist in
this environment, so the anchor is the closest measurable thing: the SAME
optimization step the reference runs (clip_fft.py:235-306) rebuilt from
torch primitives —

    FFT decode (image.py:152-177 math) -> python loop of `samples` random
    crops + F.interpolate(bicubic, align_corners=True) (utils.py:218-254)
    -> CLIP-normalize -> CLIP ViT-B/32 forward (transformers
    CLIPVisionModel, random weights = identical FLOPs) -> cosine loss ->
    backward -> Adam step

run on this machine's CPU at two configs:

  * config 1 (BASELINE.md "CPU-runnable"): 256x256, 16 samples
  * headline: 1280x720, 200 samples (the config bench.py reports)

Differences vs the true reference loop (documented, both measured sides
match): no torchvision/kornia augmentations (packages absent) — the JAX
comparison numbers printed alongside use transform='none' for parity.

Writes baseline_anchor.json {config: it/s}; bench.py reads the headline
number as its vs_baseline denominator.
"""
from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn.functional as F


def color_matrix():
    # Lucent color decorrelation (reference image.py:8-12)
    csm = np.asarray([[0.26, 0.09, 0.02],
                      [0.27, 0.00, -0.05],
                      [0.27, -0.09, 0.03]], np.float32)
    return csm / np.sqrt(np.mean(csm ** 2))


def rfft2d_freqs(h, w):
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[: w // 2 + 1]
    return np.sqrt(fx * fx + fy * fy)


class TorchFFTImage(torch.nn.Module):
    """fft_image decode (reference image.py:152-177)."""

    def __init__(self, h, w, decay=1.5, sd=0.01):
        super().__init__()
        freqs = rfft2d_freqs(h, w)
        scale = 1.0 / np.maximum(freqs, 1.0 / max(h, w)) ** decay
        self.register_buffer("scale", torch.tensor(
            scale[None, None, :, :, None], dtype=torch.float32))
        self.spectrum = torch.nn.Parameter(
            sd * torch.randn(1, 3, h, freqs.shape[1], 2))
        self.register_buffer("colcorr", torch.tensor(color_matrix().T))
        self.hw = (h, w)

    def forward(self):
        spec = torch.view_as_complex(self.scale * self.spectrum)
        img = torch.fft.irfft2(spec, s=self.hw, norm="ortho")
        img = img / (img.std() + 1e-8) * 0.25
        img = torch.einsum("nchw,cd->ndhw", img, self.colcorr)
        return torch.sigmoid(img)


def slice_imgs(img, count, modsize=224, macro=0.4):
    """Python loop of crop + bicubic resize (reference utils.py:218-254)."""
    _, _, h, w = img.shape
    sz_max = min(h, w)
    cuts = []
    for _ in range(count):
        if np.random.rand() < macro:
            csize = int(np.random.uniform(0.9 * sz_max, sz_max))
        else:
            csize = int(np.random.uniform(min(modsize, sz_max - 1), sz_max))
        offx = np.random.randint(0, w - csize + 1)
        offy = np.random.randint(0, h - csize + 1)
        cut = img[:, :, offy:offy + csize, offx:offx + csize]
        cuts.append(F.interpolate(cut, (modsize, modsize), mode="bicubic",
                                  align_corners=True))
    return torch.cat(cuts)


_MEAN = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
_STD = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)


def build_clip_vitb32():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
    cfg = CLIPVisionConfig(hidden_size=768, intermediate_size=3072,
                           num_hidden_layers=12, num_attention_heads=12,
                           image_size=224, patch_size=32, projection_dim=512)
    model = CLIPVisionModelWithProjection(cfg).eval()
    for p in model.parameters():
        p.requires_grad_(False)
    return model


def measure(size, samples, steps, warmup=1):
    torch.manual_seed(0)
    h, w = size
    gen = TorchFFTImage(h, w)
    model = build_clip_vitb32()
    txt_emb = F.normalize(torch.randn(1, 512), dim=-1)
    opt = torch.optim.Adam(gen.parameters(), lr=0.05, betas=(0.0, 0.999))

    def step():
        img = gen()
        cuts = slice_imgs(img, samples)
        cuts = (cuts - _MEAN) / _STD
        emb = model(pixel_values=cuts).image_embeds
        loss = -torch.cosine_similarity(txt_emb, emb, dim=-1).mean()
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return steps / (time.perf_counter() - t0)


def main():
    results = {}
    its1 = measure((256, 256), 16, steps=8)
    results["torch_cpu_256x256_16s"] = round(its1, 4)
    print(f"torch-CPU reference mirror @256x256/16 samples: {its1:.4f} it/s")
    its2 = measure((720, 1280), 200, steps=2)
    results["torch_cpu_1280x720_200s"] = round(its2, 4)
    print(f"torch-CPU reference mirror @1280x720/200 samples: {its2:.4f} it/s")
    import platform
    import os
    results["host"] = {"cpu_count": os.cpu_count(),
                       "platform": platform.platform(),
                       "torch": torch.__version__}
    with open("baseline_anchor.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote baseline_anchor.json")


if __name__ == "__main__":
    main()
