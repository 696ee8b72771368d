"""CPPN generator: a 1x1-conv MLP over an xy coordinate grid.

Behavioral parity with reference cppn.py:71-168 (`ConvLayer`, `CPPN`,
`get_mgrid`, `load_cppn`, `export_data`): atan-based channel-doubling
activations ('comp' / 'unbias') or normalized relu, sigmoid output, weight
init normal(0, sqrt(1/nf_in)) and bias uniform(-0.5, 0.5), and the exact
`.npy` snapshot layout ([w(1,1,in,out), b(out), ...] object array) for
cross-backend interop.

TPU-first: the 1x1 convs are plain matmuls over the flattened pixel grid
(pure MXU work; the coordinate grid is a compile-time constant).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def get_mgrid(side_x: int, side_y: int) -> np.ndarray:
    """[1,2,H,W] coordinate grid in [-1,1] (reference cppn.py:135-139)."""
    ys = np.linspace(-1, 1, num=side_y)
    xs = np.linspace(-1, 1, num=side_x)
    mgrid = np.stack(np.meshgrid(ys, xs), axis=-1)
    mgrid = np.transpose(mgrid, (2, 0, 1))[np.newaxis]
    return mgrid.astype(np.float32)


def act_comp(x):
    a = jnp.arctan(x)
    return jnp.concatenate([a / 0.67, (a * a) / 0.6], axis=-1)


def act_unbias(x):
    a = jnp.arctan(x)
    return jnp.concatenate([a / 0.67, (a * a - 0.45) / 0.396], axis=-1)


def act_relu(x):
    return (jax.nn.relu(x) - 0.40) / 0.58


_ACTS = {"comp": act_comp, "unbias": act_unbias, "relu": act_relu}


@dataclasses.dataclass(frozen=True)
class CPPNParameterizer:
    """Config: (nf_in=2 coords) -> num_layers hidden of nf -> 3 sigmoid."""
    size: tuple                  # (H, W)
    nf: int = 24
    num_layers: int = 10
    act_fn: str = "unbias"
    nf_in: int = 2
    nf_out: int = 3

    @property
    def layer_dims(self):
        hid_in = self.nf if self.act_fn == "relu" else self.nf * 2
        dims = [(self.nf_in, self.nf)]
        for _ in range(self.num_layers - 1):
            dims.append((hid_in, self.nf))
        dims.append((hid_in, self.nf_out))
        return dims

    def init(self, key: jax.Array):
        params = []
        for cin, cout in self.layer_dims:
            key, kw, kb = jax.random.split(key, 3)
            params.append({
                "w": jax.random.normal(kw, (cin, cout)) * np.sqrt(1.0 / cin),
                "b": jax.random.uniform(kb, (cout,), minval=-0.5, maxval=0.5),
            })
        return params

    def decode(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        """Full-res forward -> [1,3,H,W] in (0,1) (sigmoid output — the CPPN
        needs no color head; `shift`/`contrast` accepted for API parity)."""
        del shift, contrast
        h, w = self.size
        grid = jnp.asarray(get_mgrid(w, h))              # [1,2,H,W]
        x = grid[0].reshape(2, -1).T                     # [H*W, 2]
        act = _ACTS[self.act_fn]
        n = len(params)
        for i, p in enumerate(params):
            x = x @ p["w"] + p["b"]
            x = jax.nn.sigmoid(x) if i == n - 1 else act(x)
        return x.T.reshape(1, self.nf_out, h, w)

    def image(self, params, shift=None, contrast: float = 1.0) -> jnp.ndarray:
        return self.decode(params, shift, contrast)


def export_npy(params, path: str):
    """Snapshot as the reference's object-array layout (cppn.py:150-162):
    conv weights [1,1,in,out], biases [out]."""
    arrays = []
    for p in params:
        arrays.append(np.asarray(p["w"], np.float32)[None, None])
        arrays.append(np.asarray(p["b"], np.float32))
    np.save(path if path.endswith(".npy") else path + ".npy",
            np.array(arrays, object), allow_pickle=True)


def load_npy(path: str):
    """Load a reference-format snapshot; infers (nf, layers, act)
    (cppn.py:118-133)."""
    arrays = np.load(path, allow_pickle=True)
    nf = arrays[0].shape[-1]
    num_layers = len(arrays) // 2 - 1
    act_fn = "relu" if arrays[0].shape[-1] == arrays[2].shape[-2] else "unbias"
    params = []
    for i in range(0, len(arrays), 2):
        params.append({"w": jnp.asarray(arrays[i][0, 0], jnp.float32),
                       "b": jnp.asarray(arrays[i + 1], jnp.float32)})
    return params, nf, num_layers, act_fn


def to_shader_layers(params, act_fn: str):
    """Param pytree -> the layer-dict list the shader exporter consumes."""
    return [{"weights": np.asarray(p["w"], np.float32)[None, None],
             "bias": np.asarray(p["b"], np.float32),
             "activation": act_fn} for p in params]
