"""Compile-time benchmark for the flagship train step.

scan_layers' real payoff is HLO size / compile latency (the step itself is
slightly slower under the remat needed to fit, DESIGN.md section 6): this
times jit(...).lower(...) and .compile() separately for a given config so
the scan-vs-inline compile claim is measured, not assumed.

Usage (one TPU process at a time — the remote compile helper serializes):
    python -m tools.bench_compile --override scan_layers=True --override remat=True
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

from rag_snvbert_tpu.config import PRESETS, RunConfig
from rag_snvbert_tpu.train import schedule
from rag_snvbert_tpu.train.retrieval import encode_window_refs
from rag_snvbert_tpu.train.step import StepConfig, TrainState, train_step
from tools.bench_train_step import VOCAB, device_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tpu_default")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--ref-haps", type=int, default=2048)
    ap.add_argument("--override", action="append", default=[])
    args = ap.parse_args()

    run: RunConfig = PRESETS[args.preset]
    m = run.model
    if args.override:
        import ast
        kv = {k: ast.literal_eval(v) for k, v in
              (o.split("=", 1) for o in args.override)}
        m = dataclasses.replace(m, **kv)
        run = dataclasses.replace(run, model=m)

    b, l = args.batch, m.seq_len
    model = run.build_model(VOCAB)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    key = jax.random.key(0, impl="rbg")
    batch = jax.jit(device_batch, static_argnums=(1, 2))(key, b, l)
    from rag_snvbert_tpu.models import init_batch
    ib = init_batch(1, l, m.dims, k=run.rag_k,
                    with_rag_emb=(m.rag_mode == "embedding"),
                    with_rag_seg=(m.rag_mode == "token"))
    params = model.init({"params": jax.random.key(1), "dropout": key},
                        ib, deterministic=True)["params"]
    tx = schedule.make_optimizer(run.init_lr, run.max_lr, run.warmup_steps,
                                 accum_steps=run.grad_accum_steps)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    ctx = None
    if m.rag_mode == "embedding":
        kr = jax.random.split(jax.random.key(2), 2)
        rh = jax.random.bernoulli(kr[0], 0.3,
                                  (args.ref_haps, l)).astype(jnp.int32) + 5
        raf = jax.random.uniform(kr[1], (l,))
        ctx = jax.eval_shape(lambda p, t, a, w: encode_window_refs(
            embed_fn, p, t, a, w), state.params, rh, raf, batch["mask"][0])
        # eval_shape ctx is enough: we only lower/compile, never run.

    cfg = StepConfig(focal_gamma=run.focal_gamma, rag_k=run.rag_k)
    rng = jax.random.key(3, impl="rbg")

    fn = jax.jit(train_step, static_argnames=("embed_fn", "cfg"))
    t0 = time.time()
    lowered = fn.lower(state, batch, ctx, rng, embed_fn=embed_fn, cfg=cfg)
    t1 = time.time()
    hlo_chars = len(lowered.as_text())
    compiled = lowered.compile()
    t2 = time.time()
    mem = compiled.memory_analysis()
    out = {"preset": args.preset, "overrides": args.override,
           "batch": b,
           "lower_s": round(t1 - t0, 1), "compile_s": round(t2 - t1, 1),
           "hlo_mb": round(hlo_chars / 1e6, 1),
           "temp_gb": round(getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2)
           if mem else None}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
