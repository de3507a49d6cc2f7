"""On-device metric counters: masked accuracy, per-class TP/FP/FN,
rare/common splits, F1 assembly.

The reference syncs every batch to CPU for metrics
(pretrain_with_val_optimized.py:261-322 — a per-step device->host round
trip).  Here the counters are tiny int arrays computed inside the jitted
step and summed across the epoch on device; only the final scalars ever hit
the host.  Under pjit the counters psum automatically via the sharded sum.

Reference parity: cal_acc (optim_schedule.py:99-109), cal_pr (:167-204),
rare/common split at MAF < 0.05 (pretrain_with_val_optimized.py:281-310),
F1 assembly (:362-422).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RARE_MAF_THRESHOLD = 0.05


def masked_accuracy(logits: jax.Array, labels: jax.Array,
                    mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(correct_count, total_count) over mask==1 positions."""
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.int32)
    correct = jnp.sum((pred == labels).astype(jnp.int32) * m)
    return correct, jnp.sum(m)


def class_counts(logits: jax.Array, labels: jax.Array, mask: jax.Array,
                 num_classes: int) -> dict[str, jax.Array]:
    """Per-class {tp, fp, fn} int32 [C] counters over mask==1 positions."""
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(bool)
    classes = jnp.arange(num_classes)
    pred_oh = (pred[..., None] == classes) & m[..., None]
    label_oh = (labels[..., None] == classes) & m[..., None]
    tp = jnp.sum(pred_oh & label_oh, axis=tuple(range(pred.ndim))).astype(jnp.int32)
    fp = jnp.sum(pred_oh & ~label_oh, axis=tuple(range(pred.ndim))).astype(jnp.int32)
    fn = jnp.sum(~pred_oh & label_oh, axis=tuple(range(pred.ndim))).astype(jnp.int32)
    return {"tp": tp, "fp": fp, "fn": fn}


def batch_counters(outputs: list, labels: dict, mask: jax.Array,
                   af: jax.Array,
                   rare_threshold: float = RARE_MAF_THRESHOLD) -> dict:
    """All per-batch counters in one device-side dict (summable pytree).

    hap counters sum both haplotypes (as the reference does); rare/common
    split uses MAF = min(af, 1-af) against ``rare_threshold``.
    """
    maf = jnp.minimum(af, 1.0 - af)
    rare_mask = (maf < rare_threshold) & mask.astype(bool)
    common_mask = (maf >= rare_threshold) & mask.astype(bool)

    def both_haps(fn, m):
        a = fn(outputs[0], labels["hap_1"], m)
        b = fn(outputs[1], labels["hap_2"], m)
        return jax.tree.map(lambda x, y: x + y, a, b)

    hap_acc = both_haps(lambda o, l, m: masked_accuracy(o, l, m)[0], mask)
    gt_acc, gt_tot = masked_accuracy(outputs[2], labels["gt"], mask)

    counters = {
        "hap": both_haps(lambda o, l, m: class_counts(o, l, m, 2), mask),
        "gt": class_counts(outputs[2], labels["gt"], mask, 4),
        "rare": both_haps(lambda o, l, m: class_counts(o, l, m, 2), rare_mask),
        "common": both_haps(lambda o, l, m: class_counts(o, l, m, 2), common_mask),
        "hap_correct": hap_acc,
        "hap_total": 2 * gt_tot,
        "gt_correct": gt_acc,
        "gt_total": gt_tot,
    }
    return counters


def zeros_like_counters() -> dict:
    z2 = {"tp": jnp.zeros(2, jnp.int32), "fp": jnp.zeros(2, jnp.int32),
          "fn": jnp.zeros(2, jnp.int32)}
    z4 = {"tp": jnp.zeros(4, jnp.int32), "fp": jnp.zeros(4, jnp.int32),
          "fn": jnp.zeros(4, jnp.int32)}
    zi = jnp.zeros((), jnp.int32)
    return {"hap": dict(z2), "gt": z4, "rare": dict(z2), "common": dict(z2),
            "hap_correct": zi, "hap_total": zi, "gt_correct": zi,
            "gt_total": zi}


def accumulate(a: dict, b: dict) -> dict:
    return jax.tree.map(lambda x, y: x + y, a, b)


# ---- host-side assembly (runs once per epoch) ----

def f1_from_counts(counts: dict) -> float:
    """Macro F1 over classes from {tp, fp, fn} arrays (the reference's
    per-class precision/recall averaged, pretrain_with_val_optimized.py:
    362-422)."""
    import numpy as np

    tp = np.asarray(counts["tp"], dtype=np.float64)
    fp = np.asarray(counts["fp"], dtype=np.float64)
    fn = np.asarray(counts["fn"], dtype=np.float64)
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / np.maximum(tp + fn, 1)
    f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-12)
    return float(f1.mean())


def summarize(counters: dict) -> dict[str, float]:
    """Epoch summary scalars from accumulated counters."""
    import numpy as np

    def ratio(a, b):
        return float(np.asarray(a)) / max(float(np.asarray(b)), 1.0)

    return {
        "hap_acc": ratio(counters["hap_correct"], counters["hap_total"]),
        "gt_acc": ratio(counters["gt_correct"], counters["gt_total"]),
        "hap_f1": f1_from_counts(counters["hap"]),
        "gt_f1": f1_from_counts(counters["gt"]),
        "rare_f1": f1_from_counts(counters["rare"]),
        "common_f1": f1_from_counts(counters["common"]),
    }
