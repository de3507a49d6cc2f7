"""Jitted train/eval steps: retrieval + forward + focal losses + on-device
metrics, with optional data-parallel sharding over a mesh.

One train step fuses everything the reference does across python
(pretrain_with_val_optimized.py:124-245 + embedding_rag_dataset.py:285-444)
into a single XLA program: retrieval (grad flows through query embed and
re-embed, stop-grad through the search side), the dual-hap forward, the
3/3/4-weighted focal objective, global-norm clip, Adam with warmup +
inverse-sqrt LR, and metric counters.  No host sync inside the epoch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax.training import train_state

from . import losses, metrics
from .retrieval import (TokenWindowContext, WindowRefContext, retrieve,
                        retrieve_tokens)
from .sharded_retrieval import ShardedWindowRefContext, retrieve_sharded


class TrainState(train_state.TrainState):
    """Standard flax TrainState; ``apply_fn`` is the foundation model's
    apply, ``embed_fn`` is carried separately (static)."""


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (hashable) step configuration — a jit static argument."""

    focal_gamma: float = 2.0
    use_recon: bool = False
    rag_k: int = 1
    rare_threshold: float = 0.05
    use_pallas: bool | None = None
    ctx_merge: str = "all_gather"   # sharded-ctx candidate merge collective


def _labels(batch: dict) -> dict:
    return {"hap_1": batch["hap_1_label"], "hap_2": batch["hap_2_label"],
            "gt": batch["gt_label"]}


_INT_KEYS = ("hap_1", "hap_2", "hap_1_label", "hap_2_label", "gt_label",
             "mask")


def expand_packed(batch: dict) -> dict:
    """Undo the compact wire format of ``make_batch(packed=True)`` on
    device (free: XLA fuses the casts/broadcasts into the consumers).

    The packed layout exists because a batch crosses a slow host->device
    link every step: int8 tokens/labels/mask, window-level ``pos``/``af``
    as [L], and the per-population frequency features as [P, L, 4] rows
    gathered here by the [B] ``feat_sel`` — ~5x fewer bytes than the
    expanded [B, L] float batch.  A non-packed batch passes through
    unchanged, so every caller of train_step/eval_step can ignore this.
    """
    if "feat_rows" not in batch:
        return batch
    b = batch["hap_1"].shape[0]
    out = {k: batch[k].astype(jnp.int32) for k in _INT_KEYS}
    bc = lambda x: jnp.broadcast_to(x.astype(jnp.float32)[None, :],
                                    (b, x.shape[0]))
    out["pos"], out["af"] = bc(batch["pos"]), bc(batch["af"])
    feats = batch["feat_rows"][batch["feat_sel"].astype(jnp.int32)]  # [B,L,4]
    for i, nm in enumerate(("af_p", "ref", "het", "hom")):
        out[nm] = feats[..., i]
    for k, v in batch.items():   # pass through anything else (rag_emb_*…)
        if k not in out and k not in ("pos", "af", "feat_rows", "feat_sel"):
            out[k] = v
    return out


def _forward(apply_fn: Callable, embed_fn: Callable, params: Any,
             batch: dict, ctx: WindowRefContext | None, cfg: StepConfig,
             deterministic: bool, dropout_rng, mesh=None
             ) -> tuple[jax.Array, tuple]:
    rngs = None if deterministic else {"dropout": dropout_rng}
    batch = expand_packed(batch)
    if isinstance(ctx, TokenWindowContext):
        # V17 token-space mode: retrieval returns raw token segments; the
        # model (BERTWithRAG) re-encodes them through the transformer.
        batch = retrieve_tokens(batch, ctx, cfg.rag_k, cfg.use_pallas)
    elif isinstance(ctx, ShardedWindowRefContext):
        # Index-sharded context: per-shard search + ICI candidate merge
        # (shard_map composed into this jitted step).
        batch = retrieve_sharded(embed_fn, params, batch, ctx, mesh,
                                 cfg.rag_k, merge=cfg.ctx_merge,
                                 deterministic=deterministic, rngs=rngs)
    elif ctx is not None:
        batch = retrieve(embed_fn, params, batch, ctx, cfg.rag_k,
                         cfg.use_pallas, deterministic, rngs)
    outputs = apply_fn({"params": params}, batch, deterministic=deterministic,
                       rngs=rngs)
    labels = _labels(batch)
    mask = batch["mask"]
    loss, aux = losses.total_loss(outputs, labels, mask, cfg.focal_gamma,
                                  cfg.use_recon)
    counters = metrics.batch_counters(outputs, labels, mask, batch["af"],
                                      cfg.rare_threshold)
    return loss, (aux, counters)


def _accumulate(acc: dict | None, stats: dict) -> dict | None:
    """Fold this step's metrics into the running epoch accumulator
    ``{"counters": ..., "totals": ...}`` INSIDE the jitted step.  A
    separate per-step accumulation call measures +14 ms/step on a
    remote-attached chip (each dispatch rides the tunnel), so the epoch
    reduction lives in the same XLA program as the step."""
    if acc is None:
        return None
    counters = jax.tree.map(lambda a, b: a + b, acc["counters"],
                            stats["counters"])
    totals = {k: (v + stats[k] if k in stats else v)
              for k, v in acc["totals"].items()}
    return {"counters": counters, "totals": totals}


@partial(jax.jit, static_argnames=("embed_fn", "cfg", "mesh"),
         donate_argnames=("state", "acc"))
def train_step(state: TrainState, batch: dict,
               ctx: WindowRefContext | None, rng: jax.Array,
               embed_fn: Callable, cfg: StepConfig, mesh=None,
               acc: dict | None = None):
    """One optimizer step.  ``ctx`` is the current window's retrieval
    context (None disables RAG — the plain-BERT path).  ``mesh`` (static)
    is required only for a ShardedWindowRefContext.

    The input state is donated: its buffers are reused for the output
    state, so params + optimizer memory is constant across steps even with
    deep async dispatch pipelines.  ``acc`` (optional, donated) is the
    running epoch metric accumulator; when given, the return is
    ``(state, stats, acc')`` instead of ``(state, stats)``."""
    new_state, stats = _train_core(state, batch, ctx, rng, embed_fn, cfg,
                                   mesh)
    if acc is None:
        return new_state, stats
    return new_state, stats, _accumulate(acc, stats)


def _train_core(state, batch, ctx, rng, embed_fn, cfg, mesh):
    dropout_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        return _forward(state.apply_fn, embed_fn, params, batch, ctx, cfg,
                        deterministic=False, dropout_rng=dropout_rng,
                        mesh=mesh)

    (loss, (aux, counters)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads=grads)
    stats = {"loss": loss, **aux, "counters": counters,
             "grad_norm": optax_global_norm(grads)}
    return new_state, stats


@partial(jax.jit, static_argnames=("embed_fn", "cfg", "mesh"),
         donate_argnames=("state", "acc"))
def train_step_scan(state: TrainState, batches: dict,
                    ctx: WindowRefContext | None, rng: jax.Array,
                    embed_fn: Callable, cfg: StepConfig, mesh=None,
                    acc: dict = None):
    """K optimizer steps in ONE dispatch: ``batches`` leaves are stacked
    [K, ...] (consecutive batches of the same window) and lax.scan runs
    the identical per-step body K times on device.

    Motivation is the serving link, not FLOPs: on a remote-attached chip
    every dispatch costs ~10-20 ms of tunnel latency between steps
    (measured in DESIGN.md section 9); scanning K steps amortizes that to
    1/K while keeping semantics identical — same per-step dropout fold-in
    (state.step advances inside the scan), same optimizer updates, same
    metric accumulation into the donated ``acc``.  Returns
    ``(state, {"loss": last_step_loss}, acc')``.
    """
    def body(carry, batch):
        st, a = carry
        st, stats = _train_core(st, batch, ctx, rng, embed_fn, cfg, mesh)
        return (st, _accumulate(a, stats)), stats["loss"]

    (state, acc), losses = jax.lax.scan(body, (state, acc), batches)
    return state, {"loss": losses[-1]}, acc


@partial(jax.jit, static_argnames=("embed_fn", "cfg", "mesh"),
         donate_argnames=("acc",))
def eval_step(state: TrainState, batch: dict,
              ctx: WindowRefContext | None, embed_fn: Callable,
              cfg: StepConfig, mesh=None, acc: dict | None = None):
    """Forward-only step; with ``acc`` returns ``(stats, acc')``."""
    loss, (aux, counters) = _forward(
        state.apply_fn, embed_fn, state.params, batch, ctx, cfg,
        deterministic=True, dropout_rng=jax.random.key(0), mesh=mesh)
    stats = {"loss": loss, **aux, "counters": counters}
    if acc is None:
        return stats
    return stats, _accumulate(acc, stats)


def optax_global_norm(grads) -> jax.Array:
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))
