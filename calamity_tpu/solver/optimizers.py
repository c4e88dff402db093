"""First-order optimizer registry (optax).

Reference parity: the OPTIMIZERS dict (calibration.py:17-27) exposing
Adadelta, Adam, Adamax, Ftrl, Nadam, SGD, RMSprop, Adagrad, LAMB with
TensorFlow keyword conventions (learning_rate, beta_1, beta_2, epsilon,
rho, momentum, ...). Here each name maps to an optax transform; FTRL is
implemented in-repo since optax has no ftrl.

Defaults follow tf.keras.optimizers (lr=1e-3, eps=1e-7) so that runs
configured like the reference behave comparably.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def _common(kwargs, lr_default=1e-3):
    lr = kwargs.pop("learning_rate", lr_default)
    return lr


def _adam_like(factory, lr_default=1e-3, eps_default=1e-7):
    def build(**kwargs):
        lr = _common(kwargs, lr_default)
        b1 = kwargs.pop("beta_1", 0.9)
        b2 = kwargs.pop("beta_2", 0.999)
        eps = kwargs.pop("epsilon", eps_default)
        return factory(learning_rate=lr, b1=b1, b2=b2, eps=eps, **kwargs)

    return build


def _build_sgd(**kwargs):
    lr = _common(kwargs, 1e-2)
    momentum = kwargs.pop("momentum", 0.0) or None
    nesterov = kwargs.pop("nesterov", False)
    return optax.sgd(learning_rate=lr, momentum=momentum, nesterov=nesterov)


def _build_rmsprop(**kwargs):
    lr = _common(kwargs, 1e-3)
    rho = kwargs.pop("rho", 0.9)
    momentum = kwargs.pop("momentum", 0.0)
    eps = kwargs.pop("epsilon", 1e-7)
    centered = kwargs.pop("centered", False)
    return optax.rmsprop(
        learning_rate=lr, decay=rho, eps=eps, momentum=momentum or None, centered=centered
    )


def _build_adadelta(**kwargs):
    lr = _common(kwargs, 1e-3)
    rho = kwargs.pop("rho", 0.95)
    eps = kwargs.pop("epsilon", 1e-7)
    return optax.adadelta(learning_rate=lr, rho=rho, eps=eps)


def _build_adagrad(**kwargs):
    lr = _common(kwargs, 1e-3)
    iav = kwargs.pop("initial_accumulator_value", 0.1)
    eps = kwargs.pop("epsilon", 1e-7)
    return optax.adagrad(learning_rate=lr, initial_accumulator_value=iav, eps=eps)


def _build_lamb(**kwargs):
    lr = _common(kwargs, 1e-3)
    b1 = kwargs.pop("beta_1", 0.9)
    b2 = kwargs.pop("beta_2", 0.999)
    eps = kwargs.pop("epsilon", 1e-6)
    wd = kwargs.pop("weight_decay", 0.0)
    return optax.lamb(learning_rate=lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)


class FtrlState(NamedTuple):
    n: optax.Updates  # accumulated squared gradients
    z: optax.Updates  # linear term


def ftrl(
    learning_rate=1e-3,
    learning_rate_power=-0.5,
    initial_accumulator_value=0.1,
    l1_regularization_strength=0.0,
    l2_regularization_strength=0.0,
):
    """FTRL-proximal (McMahan et al. 2013), matching tf.keras.optimizers.Ftrl
    semantics. In-repo because optax lacks it (reference registry includes
    Ftrl, calibration.py:21)."""

    alpha = learning_rate
    lrp = learning_rate_power
    l1 = l1_regularization_strength
    l2 = l2_regularization_strength

    def init_fn(params):
        n = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params
        )
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return FtrlState(n=n, z=z)

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params")

        def upd(g, n, z, p):
            n_new = n + jnp.square(g)
            sigma = (jnp.power(n_new, -lrp) - jnp.power(n, -lrp)) / alpha
            z_new = z + g - sigma * p
            p_new = jnp.where(
                jnp.abs(z_new) <= l1,
                jnp.zeros_like(p),
                (jnp.sign(z_new) * l1 - z_new)
                / ((jnp.power(n_new, -lrp)) / alpha + 2.0 * l2),
            )
            return p_new - p, n_new, z_new

        g_flat, treedef = jax.tree_util.tree_flatten(grads)
        n_flat = treedef.flatten_up_to(state.n)
        z_flat = treedef.flatten_up_to(state.z)
        p_flat = treedef.flatten_up_to(params)
        ups, ns, zs = [], [], []
        for g, n, z, p in zip(g_flat, n_flat, z_flat, p_flat):
            u, n2, z2 = upd(g, n, z, p)
            ups.append(u)
            ns.append(n2)
            zs.append(z2)
        return (
            jax.tree_util.tree_unflatten(treedef, ups),
            FtrlState(
                n=jax.tree_util.tree_unflatten(treedef, ns),
                z=jax.tree_util.tree_unflatten(treedef, zs),
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def _build_ftrl(**kwargs):
    lr = _common(kwargs, 1e-3)
    return ftrl(learning_rate=lr, **kwargs)


OPTIMIZERS = {
    "Adadelta": _build_adadelta,
    "Adam": _adam_like(optax.adam),
    "Adamax": _adam_like(optax.adamax),
    "Ftrl": _build_ftrl,
    "Nadam": _adam_like(optax.nadam),
    "SGD": _build_sgd,
    "RMSprop": _build_rmsprop,
    "Adagrad": _build_adagrad,
    "LAMB": _build_lamb,
}


def get_optimizer(name, **opt_kwargs):
    """Instantiate an optimizer by reference-registry name."""
    if name not in OPTIMIZERS:
        raise KeyError(f"unknown optimizer {name!r}; options: {sorted(OPTIMIZERS)}")
    return OPTIMIZERS[name](**dict(opt_kwargs))
