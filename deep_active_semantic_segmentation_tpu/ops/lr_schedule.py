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
    """Return lr(step) for mode in {'poly', 'cos', 'step'}."""
    if lr_step == 0:
        lr_step = 100
    total = max(num_epochs * iters_per_epoch, 1)
    warmup_iters = warmup_epochs * iters_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = step / total
        if mode == "cos":
            lr = 0.5 * base_lr * (1.0 + jnp.cos(t * jnp.pi))
        elif mode == "poly":
            lr = base_lr * jnp.power(jnp.maximum(1.0 - t, 0.0), 0.9)
        elif mode == "step":
            epoch = jnp.floor(step / iters_per_epoch)
            lr = base_lr * jnp.power(0.2, jnp.floor(epoch / lr_step))
        else:
            raise NotImplementedError(mode)
        if warmup_iters > 0:
            lr = jnp.where(step < warmup_iters, lr * step / warmup_iters, lr)
        return lr

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)
    return schedule
