"""Compute ops: cutout sampler, resize, augmentations, losses, tiling, warps."""
