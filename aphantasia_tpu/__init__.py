"""aphantasia_tpu — TPU-native CLIP-guided image/video synthesis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of eps696/aphantasia
(reference mounted at /root/reference).  The compute path is pure functional
JAX: image parameterizers are pytrees with pure decode functions, the per-step
hot loop (decode -> cutout sampling -> augmentation -> CLIP encode -> loss ->
grad -> optax update) is a single jitted program, and multi-chip scaling goes
through jax.sharding meshes with XLA collectives.

Subpackages
-----------
params    image parameterizers: FFT spectrum, DWT wavelet pyramid, RGB pixels,
          CPPN, VQGAN latents (reference aphantasia/image.py, cppn.py)
ops       sampler / augmentations / losses / resize / warp kernels
          (reference aphantasia/utils.py, aphantasia/transforms.py)
models    frozen perception towers in JAX: CLIP, LPIPS, aesthetic head,
          Depth-Anything-V2, VQGAN decoder
parallel  device-mesh sharding + the pjit'd training step
motion    keyframe animation, frame transforms, depth warping (video modes)
io        torch-free .pt checkpoint codec, media io, config dump
cli       flag-compatible entry points: clip_fft, illustra, illustrip,
          cppn, interpol
"""

__version__ = "0.1.0"
