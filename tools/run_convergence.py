"""Chr21-scale convergence run: the committed evidence that the full
trainer — validation each epoch, rare/common F1 split, curriculum bumps,
early stopping, async checkpoints, resume — behaves at realistic scale on
real hardware (round-4 VERDICT item 1; the reference's per-epoch evidence
culture is pretrain_with_val_optimized.py:424-481 and the F1-per-epoch
tables in OPTIMIZATION_SUMMARY.md:6-13).

Unlike tools/bench_epoch_window.py (which times `_run_epoch` bare), this
drives `Trainer.fit()` on the CALIBRATED synthetic panel (neutral SFS +
LD; io/synthetic.py::make_calibrated_bundle), with a stratified
train/val sample split, writing the run directory a reader can open:
metrics.csv (per-epoch train/val rows incl. rare_f1/common_f1),
events.jsonl, checkpoints, and optionally a profiler trace of steady
steps from epoch 0.

    python -m tools.run_convergence --out runs/convergence_r4 --epochs 2
    python -m tools.run_convergence --out runs/convergence_r4 --epochs 4 \
        --resume   # restores the newest checkpoint, replays curriculum

The bundle is a pure function of (--seed, shape flags), so resume runs
regenerate identical data.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

from rag_snvbert_tpu.config import PRESETS
from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_calibrated_bundle
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tpu_default")
    ap.add_argument("--out", default="runs/convergence_r4")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--windows", type=int, default=331)
    ap.add_argument("--samples", type=int, default=1004)
    ap.add_argument("--ref-samples", type=int, default=1004)
    ap.add_argument("--val-fraction", type=float, default=0.05)
    ap.add_argument("--train-subsample", type=int, default=0,
                    help="if >0, deterministically subsample the TRAIN "
                    "cohort to this many samples AFTER the stratified "
                    "split.  The panel, reference haplotypes, windows and "
                    "val split stay bit-identical to the un-subsampled "
                    "run (the bundle is a pure fn of --seed/shapes), so "
                    "val F1 remains directly comparable across runs and "
                    "against tools/oracle_ceiling.py; only epoch "
                    "wall-clock shrinks.  Used by the round-5 "
                    "run-to-termination artifact to fit ~11 epochs in "
                    "the round's wall-clock budget")
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--curriculum-every", type=int, default=1,
                    help="epochs per mask-curriculum level bump.  The "
                    "reference bumps every 2 (train_embedding_rag.py:"
                    "415-431), which reaches the 80%% terminal level at "
                    "epoch 10; default 1 compresses the same 6-level "
                    "schedule into 6 epochs so a single-day run exercises "
                    "the full range INCLUDING the hard-mask regime — the "
                    "per-level behavior is identical, only the dwell time "
                    "per level differs")
    ap.add_argument("--warmup-steps", type=int, default=3000)
    ap.add_argument("--max-lr", type=float, default=7.5e-5)
    ap.add_argument("--patience", type=int, default=5,
                    help="early-stop patience (5 = reference default, "
                    "pretrain_with_val_optimized.py:490-522)")
    ap.add_argument("--min-delta", type=float, default=0.001,
                    help="early-stop min improvement (reference default)")
    ap.add_argument("--log-freq", type=int, default=500)
    ap.add_argument("--ref-pad-haps", type=int, default=2048,
                    help="pad each window's reference set to this many "
                    "haps (2048 = full chr21-scale panel; smaller for "
                    "smoke runs — the padded ctx is the memory driver)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of 4 steady train "
                    "steps into <out>/profile (VERDICT item 7)")
    ap.add_argument("--resume", action="store_true",
                    help="restore the newest ckpt_ep* under --out and "
                    "continue (exercises restore + curriculum replay)")
    args = ap.parse_args()

    run = PRESETS[args.preset]
    seq_len = run.model.seq_len
    win = seq_len - 10
    t0 = time.time()
    print(f"building calibrated panel: {args.samples} samples, "
          f"{2 * args.ref_samples} ref haps, {win * args.windows} sites, "
          f"{args.windows} windows", file=sys.stderr)
    b = make_calibrated_bundle(n_train_samples=args.samples,
                               n_ref_samples=args.ref_samples,
                               n_sites=win * args.windows,
                               n_windows=args.windows, seed=args.seed)
    print(f"panel built in {time.time() - t0:.0f}s", file=sys.stderr)
    train_ids, val_ids = b.panel.split_stratified(args.val_fraction,
                                                  seed=args.seed)
    if args.train_subsample and args.train_subsample < len(train_ids):
        rng = np.random.default_rng(args.seed)
        keep = rng.choice(len(train_ids), args.train_subsample,
                          replace=False)
        train_ids = np.sort(np.asarray(train_ids)[keep])
        print(f"train cohort subsampled to {len(train_ids)} "
              f"(val split unchanged: {len(val_ids)})", file=sys.stderr)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=seq_len)
    model = run.build_model(b.vocab.size)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    cfg = TrainerConfig(
        epochs=args.epochs, batch_size=run.batch_size,
        warmup_steps=args.warmup_steps, max_lr=args.max_lr,
        focal_gamma=run.focal_gamma, rag_k=run.rag_k,
        curriculum_every=args.curriculum_every, patience=args.patience,
        min_delta=args.min_delta,
        ref_pad_haps=args.ref_pad_haps, output_dir=args.out,
        log_freq=args.log_freq,
        seed=args.seed, keep_checkpoints=2,
        profile_dir=os.path.join(args.out, "profile") if args.profile
        else None)
    tr = Trainer(model, embed_fn, ds, cfg, train_sample_ids=train_ids,
                 val_sample_ids=val_ids)

    if args.resume:
        cks = sorted((n for n in os.listdir(args.out)
                      if n.startswith("ckpt_ep")),
                     key=lambda n: int(n[len("ckpt_ep"):]))
        if not cks:
            sys.exit(f"--resume: no ckpt_ep* under {args.out}")
        path = os.path.join(args.out, cks[-1])
        tr.restore_checkpoint(path)
        print(f"resumed from {path}: start_epoch={tr.start_epoch} "
              f"level={tr.level} step={int(tr.state.step)}",
              file=sys.stderr)

    out = tr.fit()
    summary = {"best": out["best"], "best_epoch": out["best_epoch"],
               "epochs_run": len(out["history"]),
               "train_samples": len(train_ids), "val_samples": len(val_ids),
               "windows": args.windows, "resumed_from": tr.start_epoch
               if args.resume else 0,
               "wall_minutes": round((time.time() - t0) / 60, 1)}
    # summary.json always holds exactly the LATEST summary (valid JSON for
    # json.load); the per-invocation history (original + resumes) appends
    # to summary_history.jsonl.
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        f.write(json.dumps(summary) + "\n")
    with open(os.path.join(args.out, "summary_history.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
