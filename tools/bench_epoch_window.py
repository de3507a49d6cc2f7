"""Full-scale-window epoch bench through the REAL Trainer loop.

Times one chr21-scale window (1004 samples, batch 24, 2008-hap reference
panel, L=1030) end to end — host batch assembly + prefetch, retrieval
context encode, jitted train steps — and projects the 331-window chr21
epoch.  This is the number behind the README epoch-time row; the
reference's V18 measures 78 min/epoch on an A100-class GPU
(HOW_TO_RUN.md:155-156).

Usage:  python -m tools.bench_epoch_window [--epochs 3] [--preset tpu_default]
The first epoch is compile + warmup; the fastest epoch is reported.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from rag_snvbert_tpu.config import PRESETS
from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

CHR21_WINDOWS = 331


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tpu_default")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--samples", type=int, default=1004)
    ap.add_argument("--ref-samples", type=int, default=1004)  # 2008 haps
    ap.add_argument("--override", action="append", default=[],
                    help="ModelConfig field=value (python literal)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="TrainerConfig.prefetch_batches")
    ap.add_argument("--scan", type=int, default=1,
                    help="TrainerConfig.steps_per_dispatch")
    ap.add_argument("--windows", type=int, default=1,
                    help="windows in the synthetic bundle; 331 = a FULL "
                    "chr21-scale epoch through the real Trainer loop "
                    "(window switches, ctx re-encodes, curriculum state) "
                    "instead of the 1-window x 331 projection")
    ap.add_argument("--log-freq", type=int, default=500,
                    help="Trainer step-log cadence (events.jsonl under "
                    "--output-dir; lets long epochs be monitored)")
    args = ap.parse_args()

    run = PRESETS[args.preset]
    m = run.model
    if args.override:
        import ast
        kv = {o.split("=", 1)[0]: ast.literal_eval(o.split("=", 1)[1])
              for o in args.override}
        m = dataclasses.replace(m, **kv)
    seq_len = m.seq_len
    win = seq_len - 10
    print(f"building synthetic window: {args.samples} samples, "
          f"{2 * args.ref_samples} ref haps, {win} sites", file=sys.stderr)
    b = make_bundle(n_train_samples=args.samples,
                    n_ref_samples=args.ref_samples,
                    n_sites=win * args.windows, n_windows=args.windows,
                    seed=5)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=seq_len)
    model = dataclasses.replace(run, model=m).build_model(b.vocab.size)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    cfg = TrainerConfig(epochs=args.epochs, batch_size=run.batch_size,
                        warmup_steps=100, grad_accum_steps=1,
                        focal_gamma=run.focal_gamma, rag_k=run.rag_k,
                        ref_pad_haps=2048, curriculum_every=10_000,
                        patience=10_000, output_dir="/tmp/bench_epoch_window",
                        log_freq=args.log_freq, seed=0,
                        async_checkpoints=False,
                        prefetch_batches=args.prefetch,
                        steps_per_dispatch=args.scan,
                        record_step_times=True)
    tr = Trainer(model, embed_fn, ds, cfg, val_ds=None)
    # fit() would checkpoint each epoch; drive epochs directly.
    times, dist = [], None
    for ep in range(args.epochs):
        s = tr._run_epoch(ep, train=True)
        times.append(s["epoch_seconds"])
        print(f"epoch {ep}: {s['epoch_seconds']:.2f}s "
              f"({s['n_batches']} steps, loss {s['loss']:.3f})",
              file=sys.stderr)
        if ep == len(range(args.epochs)) - 1 or s["epoch_seconds"] == min(times):
            import numpy as np
            marks = np.asarray(tr.step_marks or [])
            if marks.size > 3:
                deltas = np.diff(marks) * 1e3  # ms between dispatches
                dist = {"p50_ms": round(float(np.percentile(deltas, 50)), 1),
                        "p90_ms": round(float(np.percentile(deltas, 90)), 1),
                        "p99_ms": round(float(np.percentile(deltas, 99)), 1),
                        "max_ms": round(float(deltas.max()), 1)}
    best = min(times[1:]) if len(times) > 1 else times[0]
    n_steps = -(-args.samples // run.batch_size) * args.windows
    out = {"preset": args.preset, "overrides": args.override,
           "windows": args.windows,
           "epoch_seconds": round(best, 2),
           "ms_per_step_e2e": round(1e3 * best / n_steps, 1),
           "step_dist": dist,
           "chr21_epoch_min": round(best * CHR21_WINDOWS / args.windows / 60,
                                    1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
