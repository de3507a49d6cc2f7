"""Serving-path imputation throughput at chr21 scale (flagship model).

Measures the full Imputer pipeline — per-window retrieval-context encode,
query assembly, jitted forward (retrieval + dual-hap + heads), host
scatter-back — on synthetic windows at reference geometry (1020 sites,
2008 reference haplotypes, L=1030).  The reference never measured its
inference path (SURVEY.md section 4: infer spot-checked by eye only), so
the number here is the framework's own serving baseline:
  genotypes/s = imputed sites x samples / wall seconds (steady state,
  first-window compile excluded via a warmup pass).

Usage:  python -m tools.bench_infer [--samples 96] [--windows 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

from rag_snvbert_tpu.config import PRESETS
from rag_snvbert_tpu.infer.imputer import Imputer
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.io.windows import Window


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tpu_default")
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--ref-samples", type=int, default=1004)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--missing", type=float, default=0.5)
    ap.add_argument("--concurrent", type=int, default=0,
                    help="N>1: also bench N concurrent clients (same "
                         "site pattern, disjoint samples) through "
                         "BatchingImputationService vs serialized solo "
                         "requests — the cross-request batching win")
    args = ap.parse_args()

    import jax

    run = PRESETS[args.preset]
    m = run.model
    seq_len = m.seq_len
    win = seq_len - 10
    print(f"panel: {args.windows}x{win} sites, {args.samples} target / "
          f"{args.ref_samples} ref samples", file=sys.stderr)
    b = make_bundle(n_train_samples=args.samples,
                    n_ref_samples=args.ref_samples,
                    n_sites=args.windows * win, n_windows=args.windows,
                    seed=17)
    model = run.build_model(b.vocab.size)
    from rag_snvbert_tpu.models import init_batch
    ib = init_batch(1, seq_len, m.dims,
                    with_rag_emb=(m.rag_mode == "embedding"),
                    with_rag_seg=(m.rag_mode == "token"))
    params = jax.jit(lambda k: model.init(
        k, ib))(jax.random.key(0))["params"]

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    # target: drop a fraction of sites (the position_needed mask)
    rng = np.random.default_rng(3)
    keep = rng.random(b.train.n_variants) > args.missing
    target = dataclasses.replace(
        b.train, gt=b.train.gt[keep], pos=b.train.pos[keep],
        chrom=b.train.chrom[keep], ref=b.train.ref[keep],
        alt=b.train.alt[keep], ids=b.train.ids[keep])

    imp = Imputer(model, embed_fn, params, b.ref, b.freq,
                  window_len=win, seq_len=seq_len, batch_size=args.batch,
                  window=Window(b.window.window_info),
                  rag_mode=m.rag_mode)
    t0 = time.time()
    imp.impute(target)          # warmup: compiles ctx encode + forward
    warm = time.time() - t0
    t0 = time.time()
    res = imp.impute(target)
    dt = time.time() - t0

    n_imputed = int(res.imputed_flag.sum())
    genotypes = n_imputed * args.samples
    out = {"preset": args.preset, "samples": args.samples,
           "windows": args.windows, "batch": args.batch,
           "imputed_sites": n_imputed,
           "steady_s": round(dt, 2), "first_s": round(warm, 2),
           "imputed_genotypes_per_s": round(genotypes / dt, 1),
           "site_sample_forward_per_s": round(
               b.ref.n_variants * args.samples / dt, 1)}

    if args.concurrent > 1:
        import threading

        from rag_snvbert_tpu.infer.serve import BatchingImputationService

        n_c = args.concurrent
        per = args.samples // n_c
        clients = [dataclasses.replace(
            target, gt=target.gt[:, i * per:(i + 1) * per],
            samples=target.samples[i * per:(i + 1) * per])
            for i in range(n_c)]

        # serialized baseline: one client after another (per-request
        # batches are PARTIAL — this is exactly the padding waste +
        # host/device serialization the scheduler removes)
        for c in clients:
            imp.impute(c)      # warm the per-size jit shapes
        t0 = time.time()
        for c in clients:
            imp.impute(c)
        serial_s = time.time() - t0

        svc = BatchingImputationService(imputer=imp, ref_vcf=b.ref)
        svc.max_wait_ms = 200.0

        def run_all():
            threads = [threading.Thread(target=svc.handle_target, args=(c,))
                       for c in clients]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return time.time() - t0

        run_all()               # warm the merged shape
        conc_s = run_all()
        svc.close()
        out.update({
            "concurrent_clients": n_c,
            "serialized_s": round(serial_s, 2),
            "concurrent_s": round(conc_s, 2),
            "concurrency_speedup": round(serial_s / conc_s, 2),
            "sched": svc.stats})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
