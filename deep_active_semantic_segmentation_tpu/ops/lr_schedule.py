"""Learning-rate schedules as pure functions of the global step.

Parity target: reference utils/lr_scheduler.py:14-72 (poly p=0.9 / cos /
step 0.2^(epoch//lr_step) with linear warmup). In the reference the scheduler
mutates optimizer param groups per iteration; here the schedule is a pure
``lr(step)`` evaluated inside the jitted train step, and the reference's
"groups 1+ get 10x lr" rule (lr_scheduler.py:65-72) is expressed as a
per-parameter multiplier tree in ``parallel/optim.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_schedule(mode: str, base_lr: float, num_epochs: int,
                  iters_per_epoch: int, lr_step: int = 0,
                  warmup_epochs: int = 0):
    """Return lr(step[, dyn]) for mode in {'poly', 'cos', 'step'}.

    ``dyn`` is an optional (2,) f32 operand ``[total_iters,
    iters_per_epoch]`` that overrides the baked-in constants. The AL loop
    retrains from scratch every round on a GROWING labeled set
    (active_train.py:394), so iters-per-epoch changes per round; passing
    it as a traced operand lets ONE compiled train step serve every round
    (SURVEY hard part #6) instead of recompiling because a schedule
    constant moved.
    """
    if lr_step == 0:
        lr_step = 100
    total = max(num_epochs * iters_per_epoch, 1)

    def schedule(step, dyn=None):
        step = jnp.asarray(step, jnp.float32)
        total_ = total if dyn is None else jnp.maximum(dyn[0], 1.0)
        ipe = iters_per_epoch if dyn is None else jnp.maximum(dyn[1], 1.0)
        t = step / total_
        if mode == "cos":
            lr = 0.5 * base_lr * (1.0 + jnp.cos(t * jnp.pi))
        elif mode == "poly":
            lr = base_lr * jnp.power(jnp.maximum(1.0 - t, 0.0), 0.9)
        elif mode == "step":
            epoch = jnp.floor(step / ipe)
            lr = base_lr * jnp.power(0.2, jnp.floor(epoch / lr_step))
        else:
            raise NotImplementedError(mode)
        warmup_iters = warmup_epochs * ipe
        if warmup_epochs > 0:
            lr = jnp.where(step < warmup_iters, lr * step / warmup_iters, lr)
        return lr

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step, dyn=None):
        return jnp.asarray(base_lr, jnp.float32)
    return schedule
