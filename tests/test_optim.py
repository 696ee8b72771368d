"""Direct unit tests for the optimizer menu + progressive LR ramp
(reference clip_fft.py:103-115, illustrip.py:411-418)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from aphantasia_tpu.ops.optim import lr_schedule, build_optimizer


def test_lr_schedule_prog_ramp():
    # --prog: linear 0.02*lr -> 2*lr over the run (clip_fft.py:103-107)
    s = lr_schedule(1.0, 100, prog=True)
    assert s(0) == pytest.approx(0.02)
    assert s(100) == pytest.approx(2.0)
    assert s(50) == pytest.approx(0.02 + 0.5 * (2.0 - 0.02))
    assert lr_schedule(0.05, 100, prog=False) == 0.05


def _one_step(name, grads_seq, lr=0.1):
    opt = build_optimizer(name, lr)
    params = jnp.zeros((4,))
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(jnp.asarray(g, jnp.float32), state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params)


@pytest.mark.parametrize("name", ["adam", "adam_custom", "adamw",
                                  "adamw_custom"])
def test_menu_builds_and_steps(name):
    p = _one_step(name, [np.ones(4), -np.ones(4)])
    assert np.isfinite(p).all()


def test_adam_custom_beta1_zero_is_memoryless():
    # b1=0: the first moment IS the current gradient — after a sign flip
    # the update direction flips immediately (torch betas=(0.0, 0.999))
    opt = build_optimizer("adam_custom", 0.1)
    params = jnp.zeros((1,))
    state = opt.init(params)
    u1, state = opt.update(jnp.ones((1,)), state, params)
    params = optax.apply_updates(params, u1)
    u2, state = opt.update(-jnp.ones((1,)), state, params)
    assert float(u1[0]) < 0 and float(u2[0]) > 0


def test_adamw_custom_decays_weights():
    # decayed weights: from nonzero params with ZERO gradient pressure the
    # wd term must shrink them
    opt = build_optimizer("adamw_custom", 0.1)
    params = jnp.full((3,), 5.0)
    state = opt.init(params)
    updates, _ = opt.update(jnp.zeros((3,)), state, params)
    stepped = optax.apply_updates(params, updates)
    assert (np.abs(np.asarray(stepped)) < 5.0).all()
