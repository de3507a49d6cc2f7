"""LR schedule: linear warmup init_lr -> max_lr, then inverse-sqrt decay.

Reference parity: ScheduledOptim._get_lr_scale (src/main/optim_schedule.py:
33-46).  Expressed as an optax schedule (pure function of the step).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_inverse_sqrt(init_lr: float, max_lr: float,
                        warmup_steps: int) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (max_lr - init_lr) / warmup_steps * step + init_lr
        decay = max_lr * (warmup_steps ** 0.5) * jnp.where(
            step > 0, step, 1.0) ** -0.5
        return jnp.where(step <= warmup_steps, warm, decay)

    return schedule


def make_optimizer(init_lr: float = 1e-5, max_lr: float = 7.5e-5,
                   warmup_steps: int = 15000, clip_norm: float = 1.0,
                   weight_decay: float = 0.0,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """optax chain matching the reference trainer: global-norm clip 1.0 ->
    Adam -> warmup+inv-sqrt LR (pretrain_with_val_optimized.py:73-81,
    233-245), with optional gradient accumulation via MultiSteps."""
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(learning_rate=warmup_inverse_sqrt(init_lr, max_lr,
                                                      warmup_steps),
                    b1=0.9, b2=0.999, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
