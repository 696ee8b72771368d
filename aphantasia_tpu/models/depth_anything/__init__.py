"""Depth-Anything-V2 (DINOv2 ViT + DPT head) in pure JAX.

Replaces the reference's vendored torch implementation (depth/any2/**,
~1500 LoC) and its HF-transformers wrapper (depth/depth.py:20-31).  Weights
convert from HF `AutoModelForDepthEstimation` checkpoints when available;
random init keeps the video pipeline runnable hermetically.
"""
from aphantasia_tpu.models.depth_anything.dpt import (
    DAV2_CONFIGS, dav2_init, dav2_apply, InferDepthAny)
