"""Learning-rate schedule + optimizer.

Equivalent of the reference's optimizer setup (``main.py:106-122``):
Adam (no weight decay) with a 10-epoch linear warmup from 1e-6 to the
(scaled) base LR, then per-epoch exponential decay γ = 0.98
(ignite ``create_lr_scheduler_with_warmup`` around ``ExponentialLR``),
plus global-norm gradient clipping at 2.0 (``train_epoch.py:116``).

The reference steps the scheduler once per epoch (``train_loop.py:50,
113``); we express the same curve as an optax per-step schedule using
the static ``steps_per_epoch``.  The CUDA ``GradScaler`` has no TPU
equivalent or need (bf16 keeps fp32 range), so there is no loss
scaling — matching the reference's *effective* behavior, since it
never enters ``autocast`` (``train_epoch.py:7`` imported, never used).
"""

from __future__ import annotations

import optax


def warmup_exponential_schedule(base_lr: float, steps_per_epoch: int,
                                warmup_epochs: int = 10,
                                warmup_start_lr: float = 1e-6,
                                gamma: float = 0.98) -> optax.Schedule:
    """Piecewise: linear warmup over ``warmup_epochs`` epochs, then
    ``base_lr * gamma**(epochs_since_warmup)`` stepped at epoch
    boundaries (the reference updates LR only between epochs)."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        warm_frac = jnp.minimum(epoch / max(warmup_epochs, 1), 1.0)
        warm_lr = warmup_start_lr + (base_lr - warmup_start_lr) * warm_frac
        decayed = base_lr * gamma ** jnp.maximum(epoch - warmup_epochs, 0)
        return jnp.where(epoch < warmup_epochs, warm_lr, decayed)

    return schedule


def make_optimizer(base_lr: float, steps_per_epoch: int,
                   warmup_epochs: int = 10, warmup_start_lr: float = 1e-6,
                   gamma: float = 0.98,
                   grad_clip_norm: float = 2.0) -> optax.GradientTransformation:
    sched = warmup_exponential_schedule(base_lr, steps_per_epoch,
                                        warmup_epochs, warmup_start_lr, gamma)
    inner = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),   # train_epoch.py:116
        optax.adam(sched),                           # main.py:106-111
    )
    # GradScaler parity: torch's scaler.step skips the update when
    # gradients contain inf/NaN (train_epoch.py:113-118); without this
    # one bad batch poisons the parameters forever.
    return optax.apply_if_finite(inner, max_consecutive_errors=int(1e8))
