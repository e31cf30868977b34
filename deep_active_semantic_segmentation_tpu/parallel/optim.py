"""Optimizers with torch update semantics + per-leaf LR multipliers.

The reference trains with torch SGD(momentum=0.9, weight_decay=5e-4,
nesterov flag) or Adam over LR param groups (active_train.py:59-64,
lr_scheduler.py:65-72). Both are reproduced as pure pytree updates:

* SGD: g = g + wd*p; buf = mu*buf + g; step = g + mu*buf if nesterov else
  buf; p -= lr*mult*step — exactly torch.optim.SGD (dampening 0).
* Adam: torch defaults (betas 0.9/0.999, eps 1e-8), weight decay folded
  into the gradient, bias-corrected moments.

The learning rate is a traced scalar so per-iteration schedules run inside
the jitted train step with zero recompiles.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class SGDConfig(NamedTuple):
    momentum: float = 0.9
    weight_decay: float = 5e-4
    nesterov: bool = False


class AdamConfig(NamedTuple):
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 5e-4


class RMSpropConfig(NamedTuple):
    """torch.optim.RMSprop defaults (used by the reference's unet_train.py:83)."""
    alpha: float = 0.99
    eps: float = 1e-8
    weight_decay: float = 0.0


def init_opt_state(params, optimizer: str) -> Dict[str, Any]:
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    if optimizer == "SGD":
        return {"momentum": zeros(), "count": jnp.zeros((), jnp.int32)}
    if optimizer == "Adam":
        return {"mu": zeros(), "nu": zeros(), "count": jnp.zeros((), jnp.int32)}
    if optimizer == "RMSprop":
        return {"sq": zeros(), "count": jnp.zeros((), jnp.int32)}
    raise NotImplementedError(optimizer)


def rmsprop_update(params, grads, state, lr, lr_mults, cfg: RMSpropConfig):
    def upd(p, g, sq, mult):
        g = g + cfg.weight_decay * p
        sq = cfg.alpha * sq + (1 - cfg.alpha) * g * g
        return p - lr * mult * g / (jnp.sqrt(sq) + cfg.eps), sq

    out = jax.tree_util.tree_map(upd, params, grads, state["sq"], lr_mults)
    pick = lambda i: jax.tree_util.tree_map(
        lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple))
    return pick(0), {"sq": pick(1), "count": state["count"] + 1}


def sgd_update(params, grads, state, lr, lr_mults, cfg: SGDConfig):
    def upd(p, g, buf, mult):
        g = g + cfg.weight_decay * p
        buf = cfg.momentum * buf + g
        step = g + cfg.momentum * buf if cfg.nesterov else buf
        return p - lr * mult * step, buf

    out = jax.tree_util.tree_map(upd, params, grads, state["momentum"], lr_mults)
    new_params = jax.tree_util.tree_map(lambda t: t[0], out,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_bufs = jax.tree_util.tree_map(lambda t: t[1], out,
                                      is_leaf=lambda t: isinstance(t, tuple))
    return new_params, {"momentum": new_bufs, "count": state["count"] + 1}


def adam_update(params, grads, state, lr, lr_mults, cfg: AdamConfig):
    count = state["count"] + 1
    c = count.astype(jnp.float32)

    def upd(p, g, mu, nu, mult):
        g = g + cfg.weight_decay * p
        mu = cfg.b1 * mu + (1 - cfg.b1) * g
        nu = cfg.b2 * nu + (1 - cfg.b2) * g * g
        mu_hat = mu / (1 - cfg.b1 ** c)
        nu_hat = nu / (1 - cfg.b2 ** c)
        return p - lr * mult * mu_hat / (jnp.sqrt(nu_hat) + cfg.eps), mu, nu

    out = jax.tree_util.tree_map(upd, params, grads, state["mu"], state["nu"],
                                 lr_mults)
    pick = lambda i: jax.tree_util.tree_map(
        lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple))
    return pick(0), {"mu": pick(1), "nu": pick(2), "count": count}


def apply_update(optimizer: str, params, grads, state, lr, lr_mults, cfg):
    if optimizer == "SGD":
        return sgd_update(params, grads, state, lr, lr_mults, cfg)
    if optimizer == "Adam":
        return adam_update(params, grads, state, lr, lr_mults, cfg)
    if optimizer == "RMSprop":
        return rmsprop_update(params, grads, state, lr, lr_mults, cfg)
    raise NotImplementedError(optimizer)
