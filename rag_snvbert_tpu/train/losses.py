"""Losses: focal loss, masked reconstruction MSE, combined objective.

Reference parity: FocalLoss (src/main/optim_schedule.py:49-96) — softmax,
one-hot, ``-(1-p_t)^gamma * log(p_t + 1e-10)``, sum reduction as used by the
trainer (pretrain_with_val_optimized.py:87-88).  The reference always
softmaxes its input, so the double-softmax quirk (its heads already
softmax) lives entirely in the model (``compat_double_softmax``); this loss
is the same function either way.

All losses are masked-sum over [B, L] with an explicit mask argument — the
reference's fancy-indexing ``output[i][masks]`` produces dynamic shapes,
which XLA cannot compile; multiply-by-mask + sum is the static-shape
equivalent and numerically identical for sum reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(logits: jax.Array, targets: jax.Array, mask: jax.Array,
               gamma: float = 2.0, alpha: jax.Array | None = None) -> jax.Array:
    """Masked-sum focal loss.

    Args:
      logits: [B, L, C] class logits (probabilities also accepted — they are
        softmaxed like any other input, matching the reference).
      targets: [B, L] int labels.
      mask: [B, L] 1 = position contributes (the masked-site positions).
      gamma: focusing parameter.
      alpha: optional [C] per-class weights.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    tgt = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    p_t = jnp.sum(p * tgt, axis=-1)
    loss = -((1.0 - p_t) ** gamma) * jnp.log(p_t + 1e-10)
    if alpha is not None:
        loss = loss * jnp.sum(alpha * tgt, axis=-1)
    return jnp.sum(loss * mask.astype(jnp.float32))


def masked_mse(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """Reconstruction MSE over masked positions (mean over contributing
    elements), matching nn.MSELoss on ``output[3][masks]``
    (pretrain_with_val_optimized.py:221-222)."""
    m = mask.astype(jnp.float32)[..., None]
    diff = (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
    denom = jnp.maximum(jnp.sum(m) * a.shape[-1], 1.0)
    return jnp.sum(diff * m) / denom


# Loss weights (pretrain_with_val_optimized.py:228-231).
HAP_WEIGHT = 3.0
GT_WEIGHT = 4.0
# Recon-mode weights, gated by MIN_RECON_LOSS (:224-226).
RECON_WEIGHTS = (0.2, 0.2, 0.3, 0.15, 0.15)
MIN_RECON_LOSS = 0.01


def total_loss(outputs: list, labels: dict, mask: jax.Array,
               gamma: float = 2.0, use_recon: bool = False
               ) -> tuple[jax.Array, dict]:
    """Combined training loss: 3*hap1 + 3*hap2 + 4*gt focal, with the
    optional recon-gated variant (pretrain_with_val_optimized.py:215-231)."""
    hap1 = focal_loss(outputs[0], labels["hap_1"], mask, gamma)
    hap2 = focal_loss(outputs[1], labels["hap_2"], mask, gamma)
    gt = focal_loss(outputs[2], labels["gt"], mask, gamma)
    aux = {"hap_loss": hap1 + hap2, "gt_loss": gt}
    if use_recon:
        r1 = masked_mse(outputs[3], outputs[5], mask)
        r2 = masked_mse(outputs[4], outputs[6], mask)
        aux["recon_loss"] = r1 + r2
        w = RECON_WEIGHTS
        recon_total = (w[0] * hap1 + w[1] * hap2 + w[2] * gt
                       + w[3] * r1 + w[4] * r2)
        plain_total = HAP_WEIGHT * (hap1 + hap2) + GT_WEIGHT * gt
        use_gated = jnp.logical_and(r1 > MIN_RECON_LOSS, r2 > MIN_RECON_LOSS)
        total = jnp.where(use_gated, recon_total, plain_total)
    else:
        total = HAP_WEIGHT * (hap1 + hap2) + GT_WEIGHT * gt
    return total, aux
