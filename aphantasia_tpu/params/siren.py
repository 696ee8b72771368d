"""SIREN generator: a sine-activated coordinate MLP.

Capability parity with the reference's SIREN mode (README.md:140-143 lists
"Text-to-image SIREN" as a feature; the network itself lives only in an
external Colab, not in the reference tree — SURVEY.md §2.1), so this is an
implementation of the published SIREN architecture (Sitzmann et al. 2020,
"Implicit Neural Representations with Periodic Activation Functions"):

  layer 0:      sin(w0_first * (W x + b)),  W ~ U(-1/in, 1/in)
  hidden l:     sin(w0 * (W x + b)),        W ~ U(-sqrt(6/in)/w0, +...)
  output:       sigmoid(W x + b)            (image head in (0,1), like CPPN)

TPU-first: identical execution shape to the CPPN — the whole net is a chain
of [H*W, nf] matmuls over a compile-time-constant coordinate grid (pure MXU
work), jitted once and differentiated end-to-end through the CLIP loss.

Snapshots reuse the CPPN `.npy` object-array layout ([w(1,1,in,out), b(out),
...], reference cppn.py:150-162) so SIREN and CPPN nets share tooling; w0 is
not stored (pass --w0/--w0_first when resuming — defaults match the paper).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.cppn import get_mgrid, export_npy  # shared grid + snapshot


@dataclasses.dataclass(frozen=True)
class SIRENParameterizer:
    """(nf_in=2 coords) -> num_layers sine layers of nf -> 3 sigmoid."""
    size: tuple                  # (H, W)
    nf: int = 256
    num_layers: int = 5
    w0: float = 30.0
    w0_first: float = 30.0
    nf_in: int = 2
    nf_out: int = 3

    @property
    def layer_dims(self):
        dims = [(self.nf_in, self.nf)]
        for _ in range(self.num_layers - 1):
            dims.append((self.nf, self.nf))
        dims.append((self.nf, self.nf_out))
        return dims

    def _omega(self, i: int) -> float:
        return self.w0_first if i == 0 else self.w0

    def init(self, key: jax.Array):
        params = []
        dims = self.layer_dims
        n = len(dims)
        for i, (cin, cout) in enumerate(dims):
            key, kw, kb = jax.random.split(key, 3)
            if i == 0:
                bound = 1.0 / cin
            elif i == n - 1:
                bound = float(np.sqrt(6.0 / cin)) / self.w0
            else:
                bound = float(np.sqrt(6.0 / cin)) / self._omega(i)
            params.append({
                "w": jax.random.uniform(kw, (cin, cout), minval=-bound,
                                        maxval=bound),
                "b": jax.random.uniform(kb, (cout,),
                                        minval=-1.0 / np.sqrt(cin),
                                        maxval=1.0 / np.sqrt(cin)),
            })
        return params

    def decode(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        """Full-res forward -> [1,3,H,W] in (0,1). `shift`/`contrast` are
        accepted for parameterizer-API parity (sigmoid head needs neither)."""
        del shift, contrast
        h, w = self.size
        grid = jnp.asarray(get_mgrid(w, h))              # [1,2,H,W]
        x = grid[0].reshape(2, -1).T                     # [H*W, 2]
        n = len(params)
        for i, p in enumerate(params):
            x = x @ p["w"] + p["b"]
            x = jax.nn.sigmoid(x) if i == n - 1 else jnp.sin(self._omega(i) * x)
        return x.T.reshape(1, self.nf_out, h, w)

    def image(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        return self.decode(params, shift, contrast)


def load_npy(path: str):
    """Load a SIREN `.npy` snapshot; infers (nf, num_layers) from shapes
    (w0 is not stored in the shared CPPN layout — it lives on the
    parameterizer, so it is not a load-time argument)."""
    arrays = np.load(path, allow_pickle=True)
    nf = arrays[0].shape[-1]
    num_layers = len(arrays) // 2 - 1
    params = []
    for i in range(0, len(arrays), 2):
        params.append({"w": jnp.asarray(arrays[i][0, 0], jnp.float32),
                       "b": jnp.asarray(arrays[i + 1], jnp.float32)})
    return params, nf, num_layers


def to_shader_layers(params, w0: float = 30.0, w0_first: float = 30.0):
    """Param pytree -> shader-exporter layer dicts.

    The per-layer frequency w0 is folded into the exported weights/biases
    (sin(w0*(Wx+b)) == sin((w0*W)x + w0*b)) so the shader emits a plain
    sin() — no extra uniforms needed.  The output head is labelled
    'sigmoid' (not 'sine'): SIREN's final layer has no sine, and the
    shader emitter's rgb-return branch keys off the activation label."""
    n = len(params)
    layers = []
    for i, p in enumerate(params):
        w = np.asarray(p["w"], np.float32)
        b = np.asarray(p["b"], np.float32)
        if i < n - 1:
            om = np.float32(w0_first if i == 0 else w0)
            w, b = w * om, b * om
        layers.append({"weights": w[None, None], "bias": b,
                       "activation": "sine" if i < n - 1 else "sigmoid"})
    return layers


__all__ = ["SIRENParameterizer", "export_npy", "load_npy", "to_shader_layers"]
