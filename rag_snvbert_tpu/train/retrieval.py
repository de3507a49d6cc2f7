"""In-training retrieval: the TPU-native JIT-index pattern.

Reference hot path (src/dataset/embedding_rag_dataset.py:285-444):
  1. on window switch, encode the window's *masked* reference haplotypes
     with the embedding layer in eval mode, no grad -> search index;
  2. embed queries WITH grad;
  3. L2 search (cdist + topk(largest=False));
  4. re-embed the retrieved *complete* reference tokens WITH grad;
  5. scatter into rag_emb_h{1,2} [B, K, L, D].

TPU-native re-design:
  - step 1 is ``encode_window_refs`` — a separately jitted function whose
    output (the per-window search context) is carried between steps as an
    ordinary array argument; window-major batching means it changes only at
    window boundaries, amortized over the window's ~40 steps, with zero
    recompilation (SURVEY.md section 7 "index refresh without recompilation");
  - steps 2-5 are ``retrieve`` — pure, differentiable (gradients flow
    through query embedding and re-embedding; the search itself sees
    stop_gradient'ed inputs), shapes all static;
  - the reference's ``unique()`` dedup + python scatter loop (:406-443)
    becomes a plain fixed-size gather: duplicates are cheap on TPU, dedup is
    a CPU-ism (SURVEY.md section 7 "gradient through retrieval").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from ..io.vocab import MASK
from ..ops import l2_ref
from ..ops.l2_topk_pallas import l2_topk_pallas


@struct.dataclass
class WindowRefContext:
    """Per-window retrieval state, carried through train steps.

    ref_emb_search: [N, L, D] embeddings of *masked* refs (stop-grad side).
    ref_tokens:     [N, L] complete (unmasked) reference tokens.
    ref_af:         [L] window AF (shared by every reference haplotype).
    ref_norms:      [N] squared norms of flattened ref_emb_search (+inf for
                    padding rows).
    """

    ref_emb_search: jax.Array
    ref_tokens: jax.Array
    ref_af: jax.Array
    ref_norms: jax.Array


@struct.dataclass
class TokenWindowContext:
    """Per-window retrieval state for the V17 token-space mode
    (src/dataset/rag_train_dataset.py:22-358): the index is over raw
    *masked token vectors* (d = L) and retrieval returns the *unmasked*
    token segments, which the model re-encodes through the full
    transformer (BERTWithRAG.encode_rag_segments)."""

    ref_tokens_masked: jax.Array   # [N, L] int32 (search side)
    ref_tokens: jax.Array          # [N, L] complete tokens (result side)
    ref_norms: jax.Array           # [N] f32 norms of masked vectors
    # Static: the kernel's norm-fused int8 path pre-doubles queries, so
    # ids must satisfy |id| <= 63; vocab = 7 specials + alleles + pops,
    # so this only trips at >= 54 populations (cap checked at build).
    ids_fit_int8: bool = struct.field(pytree_node=False, default=True)


def build_token_window_ctx(ref_tokens: jax.Array, window_mask: jax.Array,
                           valid: jax.Array | None = None
                           ) -> TokenWindowContext:
    """Token-space 'index build': mask the refs and cache vector norms
    (replaces the per-window faiss.IndexFlatL2(1030).add,
    rag_train_dataset.py:129-137)."""
    masked = apply_token_mask(ref_tokens, window_mask)
    norms = l2_ref.squared_norms(masked.astype(jnp.float32))
    if valid is not None:
        norms = jnp.where(valid, norms, jnp.inf)
    # Concrete at every call site (per-window host-driven build): one
    # cheap fetch decides whether the int8 kernel path is value-safe.
    fits = True
    if not isinstance(ref_tokens, jax.core.Tracer):
        fits = int(jnp.max(ref_tokens)) <= 63
    return TokenWindowContext(ref_tokens_masked=masked,
                              ref_tokens=ref_tokens, ref_norms=norms,
                              ids_fit_int8=fits)


def retrieve_tokens(batch: dict, ctx: TokenWindowContext, k: int = 1,
                    use_pallas: bool | None = None) -> dict:
    """Token-space retrieval: L2 over raw masked token vectors, returning
    unmasked token segments ``rag_seg_h{1,2}`` [B, K, L]
    (rag_collate_fn_with_dataset, rag_train_dataset.py:232-358).

    Non-differentiable by construction (token ids), matching the
    reference, where retrieval runs in DataLoader workers.
    """
    if use_pallas is None:
        n = ctx.ref_tokens_masked.shape[0]
        use_pallas = (jax.default_backend() == "tpu" and n > 16384)
    # int8 value safety: the kernel pre-doubles queries, so ids > 63
    # would wrap — fall back to the exact f32 path (>= 54 populations).
    use_pallas = use_pallas and ctx.ids_fit_int8
    # One stacked [2B, L] search for both haplotypes (half the dispatches).
    q = jnp.concatenate([batch["hap_1"], batch["hap_2"]], axis=0)
    if use_pallas:
        # Token ids are tiny ints: the kernel's int8 path gives exact
        # int32 distances at double MXU rate.
        _, ids = l2_topk_pallas(q.astype(jnp.int8),
                                ctx.ref_tokens_masked.astype(jnp.int8),
                                ctx.ref_norms, k)
    else:
        d = l2_ref.l2_distances(q.astype(jnp.float32),
                                ctx.ref_tokens_masked.astype(jnp.float32),
                                r_norms=ctx.ref_norms)
        _, ids = l2_ref.topk_smallest(d, k)
    i1, i2 = jnp.split(ids, 2, axis=0)  # [B, k] each
    out = dict(batch)
    out["rag_seg_h1"] = ctx.ref_tokens[i1]  # [B, k, L]
    out["rag_seg_h2"] = ctx.ref_tokens[i2]
    return out


def apply_token_mask(tokens: jax.Array, mask: jax.Array) -> jax.Array:
    """Overwrite masked positions with the [MASK] token
    (embedding_rag_dataset.py:446-461); ``mask`` is in padded coords [L]."""
    return jnp.where(mask.astype(bool)[None, :], jnp.int32(MASK), tokens)


@partial(jax.jit, static_argnames=("embed_fn", "dtype"))
def encode_window_refs(embed_fn: Callable, params: Any,
                       ref_tokens: jax.Array, ref_af: jax.Array,
                       window_mask: jax.Array,
                       valid: jax.Array | None = None,
                       dtype=jnp.bfloat16) -> WindowRefContext:
    """Build the search context for one window (the "JIT GPU index build").

    Jitted here (not at call sites): eager execution materializes every
    [N, L, D] f32 temporary of the embed pipeline — several GB each at
    2048 haplotypes — and the un-fused peak HBM can OOM a serving
    process; one fused program keeps the peak at ~the bf16 output.

    Args:
      embed_fn: ``(params, tokens [N, L], af [N, L], deterministic) -> emb``
        — the model's embedding layer, run in eval mode (dropout off) so the
        index is stable, matching embedding_layer.eval() + no_grad
        (embedding_rag_dataset.py:360-377).
      ref_tokens: [N, L] complete reference tokens (N padded to a static
        panel size; pass ``valid`` [N] bool to exclude padding rows).
      ref_af: [L] window allele frequencies.
      window_mask: [L] 0/1 mask in padded coords — the same AF-guided mask
        the queries use this epoch (query/reference mask alignment).
    """
    masked = apply_token_mask(ref_tokens, window_mask)
    af_exp = jnp.broadcast_to(ref_af[None, :], masked.shape)
    emb = embed_fn(params, masked, af_exp, True)
    emb = jax.lax.stop_gradient(emb).astype(dtype)
    n = emb.shape[0]
    norms = l2_ref.squared_norms(emb.reshape(n, -1))
    if valid is not None:
        norms = jnp.where(valid, norms, jnp.inf)
    return WindowRefContext(ref_emb_search=emb, ref_tokens=ref_tokens,
                            ref_af=ref_af, ref_norms=norms)


def _search(q_emb: jax.Array, ctx: WindowRefContext, k: int,
            use_pallas: bool | None) -> jax.Array:
    """Top-k ids for queries [B, L, D] against the window context.

    Kernel choice is workload-aware: for the in-training shape (B ~ 24
    queries vs N ~ 2k refs) one XLA matmul + lax.top_k is already
    MXU-optimal and compiles in seconds, while the streaming Pallas kernel
    pays off when N is large enough that materializing [B, N] distances
    (and its compile cost over huge-d grids) matters — the serving /
    offline-query regime.  ``use_pallas`` overrides: True/False force a
    path, None auto-selects.
    """
    b = q_emb.shape[0]
    n = ctx.ref_emb_search.shape[0]
    qf = jax.lax.stop_gradient(q_emb).astype(ctx.ref_emb_search.dtype)
    qf = qf.reshape(b, -1)
    rf = ctx.ref_emb_search.reshape(n, -1)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and b * n > 4_000_000)
    if use_pallas:
        _, ids = l2_topk_pallas(qf, rf, ctx.ref_norms, k)
    else:
        d = l2_ref.l2_distances(qf, rf, r_norms=ctx.ref_norms)
        _, ids = l2_ref.topk_smallest(d, k)
    return ids  # [B, k]


def retrieve(embed_fn: Callable, params: Any, batch: dict,
             ctx: WindowRefContext, k: int = 1,
             use_pallas: bool | None = None,
             deterministic: bool = True,
             rngs: dict | None = None) -> dict:
    """Differentiable retrieval for one window-major batch.

    Returns the batch extended with ``rag_emb_h1``/``rag_emb_h2``
    [B, K, L, D] (with gradient through the re-embedding), matching
    process_batch_retrieval (embedding_rag_dataset.py:285-444).
    """
    def embed(tokens, af):
        return embed_fn(params, tokens, af, deterministic, rngs)

    af = batch["af"]
    b = batch["hap_1"].shape[0]
    # One stacked [2B, L] embed + search for both haplotypes: halves the
    # retrieval programs and feeds the MXU one fat matmul.
    toks = jnp.concatenate([batch["hap_1"], batch["hap_2"]], axis=0)
    af2 = jnp.concatenate([af, af], axis=0)
    q = embed(toks, af2)                                 # [2B, L, D] w/ grad

    ids = _search(q, ctx, k, use_pallas)                 # [2B, k]

    all_ids = ids.reshape(-1)                            # [2*B*k]
    ret_tokens = ctx.ref_tokens[all_ids]                          # [2Bk, L]
    ret_af = jnp.broadcast_to(ctx.ref_af[None, :], ret_tokens.shape)
    ret_emb = embed(ret_tokens, ret_af)                           # with grad
    d = ret_emb.shape[-1]
    l = ret_emb.shape[-2]
    rag1, rag2 = jnp.split(ret_emb, 2, axis=0)
    out = dict(batch)
    out["rag_emb_h1"] = rag1.reshape(b, k, l, d)
    out["rag_emb_h2"] = rag2.reshape(b, k, l, d)
    # The model's forward would re-embed the same [2B, L] tokens (so does
    # the reference, embedding_rag_dataset.py:385 + bert.py:163-164); hand
    # the embedding over instead — gradient flows through it exactly once.
    out["query_emb"] = q
    return out
