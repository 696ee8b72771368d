"""Optimizers via optax, matching the reference's torch.optim menu.

Parity: clip_fft.py:103-115 / illustrip.py:411-418 —
  adam          Adam(lr)                       (betas 0.9/0.999)
  adam_custom   Adam(lr, betas=(0.0, 0.999))   [DEFAULT]
  adamw         AdamW(lr, wd=0.01)
  adamw_custom  AdamW(lr, wd=0.01, betas=(0.0, 0.999), amsgrad=True)
plus the progressive LR ramp (`--prog`, clip_fft.py:103-107,288-291):
lr goes linearly from 0.02*lrate to 2*lrate over the run.
"""
from __future__ import annotations

import optax


def lr_schedule(lrate: float, steps: int, prog: bool = False):
    """Returns an optax schedule; constant unless `prog`."""
    if not prog:
        return lrate
    lr1 = lrate * 2.0
    lr0 = lr1 * 0.01
    return lambda i: lr0 + (i / steps) * (lr1 - lr0)


def build_optimizer(name: str, lrate, steps: int = 0, prog: bool = False):
    lr = lr_schedule(lrate, max(steps, 1), prog)
    name = name.lower()
    if name == "adamw":
        return optax.adamw(lr, weight_decay=0.01)
    if name == "adamw_custom":
        return optax.chain(
            optax.scale_by_amsgrad(b1=0.0, b2=0.999),
            optax.add_decayed_weights(0.01),
            optax.scale_by_learning_rate(lr),
        )
    if name == "adam":
        return optax.adam(lr)
    # adam_custom (default)
    return optax.adam(lr, b1=0.0, b2=0.999)
