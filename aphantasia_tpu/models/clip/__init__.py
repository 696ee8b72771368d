"""CLIP text/image encoders, TPU-native.

Ground-up JAX implementation of the OpenAI CLIP architecture family used by
the reference (clip_fft.py:33 model list; loaded via `clip.load`,
clip_fft.py:119-136).  Weights convert from OpenAI checkpoints when provided;
otherwise random init (same shapes/FLOPs) keeps the pipeline runnable in
hermetic environments.
"""
from aphantasia_tpu.models.clip.model import (
    CLIP_CONFIGS, CLIPConfig, clip_init, encode_image, encode_text, load_clip,
)
from aphantasia_tpu.models.clip.tokenizer import tokenize
