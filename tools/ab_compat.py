"""Flagship-scale compat-vs-fixed A/B on hardware (ROADMAP item 7).

Round 1 measured the post-LN/double-softmax/attn-dropout quirks against the
fixed defaults only at 64d/2L (DESIGN.md section 10).  This reruns the same
same-panel, same-seed A/B at the flagship geometry — 384d/12L, L=1030,
bf16 — on a synthetic structured panel large enough for real retrieval,
with a held-out validation split of the single cohort (the reference's
split workflow, scripts/split_data.py).

Variants:
  fixed    : tpu_default (pre-LN, logits heads, attn_dropout=0,
             sequence-broadcast residual dropout)
  perdim   : fixed but per-element residual dropout (isolates the
             broadcast-mask perf knob's quality cost)
  compat   : reference topology (post-LN, double-softmax heads,
             attention-prob dropout, per-element dropout)

Usage:
    python -m tools.ab_compat [--epochs 14] [--variants fixed,compat]
Prints one JSON line per variant; paste the table into DESIGN.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

from rag_snvbert_tpu.config import PRESETS
from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

VARIANTS = {
    "fixed": {},
    "perdim": {"dropout_broadcast": False},
    "compat": {"pre_ln": False, "compat_double_softmax": True,
               "attn_dropout": None, "dropout_broadcast": False},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--train-samples", type=int, default=192)
    ap.add_argument("--ref-samples", type=int, default=1024)
    ap.add_argument("--val-frac", type=float, default=0.25)
    ap.add_argument("--variants", default="fixed,perdim,compat")
    ap.add_argument("--outdir", default="/tmp/ab_compat")
    ap.add_argument("--flash", default=None,
                    help="flash_attention override for ALL variants "
                         "(e.g. splash:384f); default = preset value")
    args = ap.parse_args()

    run = PRESETS["tpu_default"]
    seq_len = run.model.seq_len
    win = seq_len - 10
    print(f"panel: {args.windows} windows x {win} sites, "
          f"{args.train_samples} train / {args.ref_samples} ref samples",
          file=sys.stderr)
    b = make_bundle(n_train_samples=args.train_samples,
                    n_ref_samples=args.ref_samples,
                    n_sites=args.windows * win, n_windows=args.windows,
                    seed=7)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=seq_len)
    # stratified-by-construction split (samples cycle over pops)
    n_val = int(args.train_samples * args.val_frac)
    ids = np.arange(args.train_samples)
    val_ids, train_ids = ids[:n_val], ids[n_val:]

    for name in args.variants.split(","):
        m = dataclasses.replace(run.model, **VARIANTS[name])
        if args.flash is not None:
            m = dataclasses.replace(m, flash_attention=args.flash)
        model = dataclasses.replace(run, model=m).build_model(b.vocab.size)

        def embed_fn(p, toks, af, deterministic, rngs=None, _m=model):
            return _m.apply({"params": p}, toks, af, deterministic,
                            method=_m.embed, rngs=rngs)

        cfg = TrainerConfig(
            epochs=args.epochs, batch_size=run.batch_size,
            val_batch_size=run.val_batch_size, init_lr=run.init_lr,
            max_lr=run.max_lr, warmup_steps=60,
            grad_accum_steps=1, focal_gamma=run.focal_gamma,
            rag_k=run.rag_k, ref_pad_haps=2048, curriculum_every=2,
            patience=args.epochs,  # no early stop: full identical budget
            output_dir=f"{args.outdir}/{name}", log_freq=10_000, seed=42)
        t0 = time.time()
        tr = Trainer(model, embed_fn, ds, cfg, train_sample_ids=train_ids,
                     val_sample_ids=val_ids)
        res = tr.fit()
        hist = res["history"]
        best = max(hist, key=lambda r: r["val_hap_f1"])
        out = {"variant": name, "epochs": len(hist),
               "best_val_hap_f1": round(best["val_hap_f1"], 4),
               "best_epoch": best["epoch"],
               "final_val_hap_f1": round(hist[-1]["val_hap_f1"], 4),
               "final_val_rare_f1": round(hist[-1].get("val_rare_f1",
                                                       float("nan")), 4),
               "final_train_loss": round(hist[-1]["train_loss"], 4),
               "wall_min": round((time.time() - t0) / 60, 1)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
