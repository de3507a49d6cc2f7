"""Flagship train-step benchmark (B=24, L=1030, 12L/384d, embedding RAG).

Measures the full jitted train step — retrieval + dual-hap forward + focal
losses + Adam — with fetch-forced two-point-slope timing
(utils/benchmarking.chained_state_ms), on-device synthetic data (the
remote-tunnel host->device link is too slow/noisy to include).

Reference numbers this chases: V18 115-125 ms @ B=32 on one A100-class GPU
(EMBEDDING_RAG_EXPLAINED.md:386) — ~3.75 ms/sample; FLOPs-normalized to
this 1.6x-weaker v5e chip: ~5.9 ms/sample, i.e. ~143 ms @ B=24.

Usage:
    python tools/bench_train_step.py                     # tpu_default
    python tools/bench_train_step.py --override flash_attention=True
    python tools/bench_train_step.py --batch 32 --fwd-only
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rag_snvbert_tpu.config import PRESETS, ModelConfig, RunConfig
from rag_snvbert_tpu.train import schedule
from rag_snvbert_tpu.train.retrieval import encode_window_refs
from rag_snvbert_tpu.train.step import StepConfig, TrainState, train_step
from rag_snvbert_tpu.utils.benchmarking import (chained_state_ms,
                                                fetch_scalar,
                                                steady_state_ms)

VOCAB = 9


def device_batch(key, b, l):
    """Synthetic flagship batch generated on device (no host transfer)."""
    ks = jax.random.split(key, 4)
    h1 = jax.random.bernoulli(ks[0], 0.3, (b, l)).astype(jnp.int32)
    h2 = jax.random.bernoulli(ks[1], 0.3, (b, l)).astype(jnp.int32)
    mask = jax.random.bernoulli(ks[2], 0.5, (l,)).astype(jnp.int32)
    toks = lambda h: jnp.where(mask[None, :] == 1, 4, h + 5)
    af = jax.random.uniform(ks[3], (l,))
    bc = lambda x: jnp.broadcast_to(x[None, :], (b, l)).astype(jnp.float32)
    return {
        "hap_1": toks(h1), "hap_2": toks(h2),
        "hap_1_label": h1, "hap_2_label": h2,
        "gt_label": (h1 << 1) + h2,
        "mask": jnp.broadcast_to(mask[None, :], (b, l)),
        "pos": bc(jnp.linspace(0, 1, l)), "af": bc(af),
        "af_p": bc(af), "ref": bc(1 - af), "het": bc(af * (1 - af)),
        "hom": bc(af * af),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tpu_default")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--ref-haps", type=int, default=2048)
    ap.add_argument("--override", action="append", default=[],
                    help="ModelConfig field=value (python literal)")
    ap.add_argument("--fwd-only", action="store_true",
                    help="time eval_step (no grad/optimizer) instead")
    ap.add_argument("--grad-only", action="store_true",
                    help="time value_and_grad WITHOUT the optimizer "
                    "update/metrics (isolates bwd cost from Adam)")
    ap.add_argument("--no-rag", action="store_true",
                    help="ctx=None: isolates the encoder+heads cost")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    run: RunConfig = PRESETS[args.preset]
    m = run.model
    if args.override:
        import ast
        kv = {}
        for o in args.override:
            k, v = o.split("=", 1)
            kv[k] = ast.literal_eval(v)
        m = dataclasses.replace(m, **kv)
        run = dataclasses.replace(run, model=m)
    if args.no_rag:
        m = dataclasses.replace(m, rag_mode="none")
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
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", file=sys.stderr)

    tx = schedule.make_optimizer(run.init_lr, run.max_lr, run.warmup_steps,
                                 accum_steps=run.grad_accum_steps)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    ctx = None
    if m.rag_mode == "embedding":
        kr = jax.random.split(jax.random.key(2), 2)
        rh = jax.random.bernoulli(kr[0], 0.3,
                                  (args.ref_haps, l)).astype(jnp.int32) + 5
        raf = jax.random.uniform(kr[1], (l,))
        wmask = batch["mask"][0]
        enc = jax.jit(lambda p, t, a, w: encode_window_refs(
            embed_fn, p, t, a, w))
        import time
        t0 = time.time()
        ctx = enc(state.params, rh, raf, wmask)
        fetch_scalar(ctx.ref_norms)
        t1 = time.time()
        ctx = enc(state.params, rh, raf, wmask)
        fetch_scalar(ctx.ref_norms)
        print(f"ctx encode: {(time.time()-t1)*1e3:.1f} ms "
              f"(first {t1-t0:.1f} s)", file=sys.stderr)

    cfg = StepConfig(focal_gamma=run.focal_gamma, rag_k=run.rag_k)
    rng = jax.random.key(3, impl="rbg")

    if args.fwd_only:
        from rag_snvbert_tpu.train.step import eval_step
        fn = lambda: eval_step(state, batch, ctx, embed_fn, cfg)
        r = steady_state_ms(fn, iters_lo=2, iters_hi=args.iters)
    elif args.grad_only:
        from rag_snvbert_tpu.train.step import _forward
        import functools

        @functools.partial(jax.jit, static_argnames=("efn", "scfg"))
        def grad_step(params, batch, ctx, rng, efn, scfg):
            def loss_fn(p):
                loss, _ = _forward(model.apply, efn, p, batch, ctx, scfg,
                                   deterministic=False, dropout_rng=rng,
                                   mesh=None)
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            # one scalar touching every grad leaf (forces the whole bwd)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32) % 7)
                       for g in jax.tree.leaves(grads))
            return loss + 1e-30 * gsum

        fn = lambda: grad_step(state.params, batch, ctx, rng, embed_fn, cfg)
        r = steady_state_ms(fn, iters_lo=2, iters_hi=args.iters)
    else:
        step = lambda st: train_step(st, batch, ctx, rng, embed_fn, cfg)
        r = chained_state_ms(step, state, iters_lo=2, iters_hi=args.iters)

    out = {"preset": args.preset, "batch": b,
           "overrides": args.override, "fwd_only": args.fwd_only,
           "grad_only": args.grad_only,
           "no_rag": args.no_rag,
           "ms_per_step": round(r["per_iter_ms"], 2),
           "ms_per_sample": round(r["per_iter_ms"] / b, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
