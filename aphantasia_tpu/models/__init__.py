"""Frozen perception models in JAX: CLIP, LPIPS, aesthetic head,
Depth-Anything-V2, VQGAN decoder."""
