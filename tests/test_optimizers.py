"""Optimizer registry tests: every reference-named optimizer descends."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from calamity_tpu.solver.optimizers import OPTIMIZERS, get_optimizer


@pytest.mark.parametrize("name", sorted(OPTIMIZERS))
def test_optimizer_descends_quadratic(name):
    opt = get_optimizer(name, learning_rate=0.1)
    target = jnp.asarray([1.0, -2.0, 0.5])

    def loss_fn(x):
        return jnp.sum((x - target) ** 2)

    x = jnp.zeros(3)
    state = opt.init(x)

    @jax.jit
    def step(x, state):
        loss, g = jax.value_and_grad(loss_fn)(x)
        updates, state = opt.update(g, state, x)
        return optax.apply_updates(x, updates), state, loss

    losses = []
    for _ in range(300):
        x, state, loss = step(x, state)
        losses.append(float(loss))
    # Adadelta's accumulator warm-up makes early steps tiny (true of the
    # reference's tf.optimizers.Adadelta as well); require monotone progress
    factor = 0.95 if name == "Adadelta" else 0.05
    assert losses[-1] < factor * losses[0], f"{name} failed to descend: {losses[-1]}"


def test_optimizer_tf_kwargs():
    """TensorFlow keyword conventions are accepted (reference opt_kwargs
    pass-through, calibration.py:547-571)."""
    opt = get_optimizer("Adam", learning_rate=1e-3, beta_1=0.8, beta_2=0.95,
                        epsilon=1e-8)
    x = jnp.ones(2)
    state = opt.init(x)
    updates, _ = opt.update(jnp.ones(2), state, x)
    assert np.all(np.isfinite(np.asarray(updates)))


def test_unknown_optimizer():
    with pytest.raises(KeyError):
        get_optimizer("Blarghle")


def test_ftrl_sparsity():
    """FTRL l1 regularization drives small-gradient coords to exactly zero."""
    opt = get_optimizer("Ftrl", learning_rate=0.5,
                        l1_regularization_strength=0.1)
    target = jnp.asarray([5.0, 0.001])

    def loss_fn(x):
        return jnp.sum((x - target) ** 2)

    x = jnp.zeros(2)
    state = opt.init(x)
    for _ in range(200):
        g = jax.grad(loss_fn)(x)
        updates, state = opt.update(g, state, x)
        x = optax.apply_updates(x, updates)
    x = np.asarray(x)
    assert abs(x[0] - 5.0) < 0.2      # strong signal recovered
    assert abs(x[1]) < 1e-3            # weak signal shrunk toward zero
