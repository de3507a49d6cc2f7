"""Training-run analysis: metrics CSV / events.jsonl -> DataFrames + plots.

Replaces the reference's regex log scraping
(scripts/analyze_training_log.py:14-302) — our trainer emits structured
metrics.csv and events.jsonl directly, so "parsing" is a read — and its CSV
plotter with rare/common panels (scripts/plot_metrics_csv.py:13-175).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def load_metrics_csv(path: str) -> pd.DataFrame:
    return pd.read_csv(path)


def load_events(path: str, event: str | None = None) -> pd.DataFrame:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if event is None or rec.get("event") == event:
                rows.append(rec)
    return pd.DataFrame(rows)


def epoch_summary(run_dir: str) -> pd.DataFrame:
    """One row per epoch with train/val losses and F1 splits."""
    return load_metrics_csv(os.path.join(run_dir, "metrics.csv"))


def plot_metrics(run_dir: str, out_path: str | None = None):
    """Loss + overall/rare/common F1 panels (plot_metrics_csv.py parity)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = epoch_summary(run_dir)
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))

    axes[0].plot(df["epoch"], df["train_loss"], label="train")
    if "val_loss" in df:
        axes[0].plot(df["epoch"], df["val_loss"], label="val")
    axes[0].set_title("loss")
    axes[0].set_xlabel("epoch")
    axes[0].legend()

    for col, label in [("train_hap_f1", "train hap"), ("val_hap_f1", "val hap"),
                       ("val_gt_f1", "val gt")]:
        if col in df:
            axes[1].plot(df["epoch"], df[col], label=label)
    axes[1].set_title("F1")
    axes[1].set_xlabel("epoch")
    axes[1].legend()

    for col, label in [("val_rare_f1", "rare"), ("val_common_f1", "common")]:
        if col in df:
            axes[2].plot(df["epoch"], df[col], label=label)
    axes[2].set_title("rare vs common F1 (MAF @ 0.05)")
    axes[2].set_xlabel("epoch")
    axes[2].legend()

    fig.tight_layout()
    out = out_path or os.path.join(run_dir, "metrics.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def compare_checkpoints(path_a: str, path_b: str, top: int = 10) -> pd.DataFrame:
    """Per-parameter drift between two orbax checkpoints (the reference's
    debug_model_weights.py workflow): L2 norm of the delta and relative
    change, sorted descending."""
    from .ckpt import restore_tree

    a = restore_tree(path_a)
    b = restore_tree(path_b)

    rows = []

    def walk(pa, pb, prefix):
        if isinstance(pa, dict):
            for k in pa:
                walk(pa[k], pb[k], f"{prefix}/{k}")
            return
        pa = np.asarray(pa, np.float64)
        pb = np.asarray(pb, np.float64)
        if pa.shape != pb.shape or pa.dtype.kind not in "fiu":
            return
        delta = float(np.linalg.norm(pb - pa))
        base = float(np.linalg.norm(pa))
        rows.append({"param": prefix, "shape": list(pa.shape),
                     "delta_l2": delta,
                     "rel_change": delta / max(base, 1e-12)})

    walk(a.get("params", a), b.get("params", b), "")
    df = pd.DataFrame(rows).sort_values("delta_l2", ascending=False)
    return df.head(top) if top else df


def inspect_freq(freq_path: str) -> dict:
    """Frequency-table audit (the reference's test_fq.py / test_input_freqnpy
    NaN checks): NaN/inf counts, layer consistency, AF range."""
    z = np.load(freq_path if freq_path.endswith(".npz")
                else freq_path + ".npz")
    f = z["freq"]
    report = {
        "shape": list(f.shape),
        "nan_count": int(np.isnan(f).sum()),
        "inf_count": int(np.isinf(f).sum()),
        "af_min": float(np.nanmin(f[3])),
        "af_max": float(np.nanmax(f[3])),
        "gt_layers_sum_to_1": bool(
            np.allclose(f[0] + f[1] + f[2], 1.0, atol=1e-4)),
    }
    return report
