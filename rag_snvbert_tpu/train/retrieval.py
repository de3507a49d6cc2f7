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

from ..index.flat import FlatL2Index
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


def apply_token_mask(tokens: jax.Array, mask: jax.Array) -> jax.Array:
    """Overwrite masked positions with the [MASK] token
    (embedding_rag_dataset.py:446-461); ``mask`` is in padded coords [L]."""
    return jnp.where(mask.astype(bool)[None, :], jnp.int32(MASK), tokens)


def encode_window_refs(embed_fn: Callable, params: Any,
                       ref_tokens: jax.Array, ref_af: jax.Array,
                       window_mask: jax.Array,
                       valid: jax.Array | None = None,
                       dtype=jnp.bfloat16) -> WindowRefContext:
    """Build the search context for one window (the "JIT GPU index build").

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
            use_pallas: bool) -> jax.Array:
    """Top-k ids for queries [B, L, D] against the window context."""
    b = q_emb.shape[0]
    n = ctx.ref_emb_search.shape[0]
    qf = jax.lax.stop_gradient(q_emb).astype(ctx.ref_emb_search.dtype)
    qf = qf.reshape(b, -1)
    rf = ctx.ref_emb_search.reshape(n, -1)
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
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def embed(tokens, af):
        return embed_fn(params, tokens, af, deterministic, rngs)

    af = batch["af"]
    q1 = embed(batch["hap_1"], af)  # [B, L, D] with grad
    q2 = embed(batch["hap_2"], af)

    i1 = _search(q1, ctx, k, use_pallas)  # [B, k]
    i2 = _search(q2, ctx, k, use_pallas)

    b = q1.shape[0]
    all_ids = jnp.concatenate([i1.reshape(-1), i2.reshape(-1)])   # [2*B*k]
    ret_tokens = ctx.ref_tokens[all_ids]                          # [2Bk, L]
    ret_af = jnp.broadcast_to(ctx.ref_af[None, :], ret_tokens.shape)
    ret_emb = embed(ret_tokens, ret_af)                           # with grad
    d = ret_emb.shape[-1]
    l = ret_emb.shape[-2]
    rag1, rag2 = jnp.split(ret_emb, 2, axis=0)
    out = dict(batch)
    out["rag_emb_h1"] = rag1.reshape(b, k, l, d)
    out["rag_emb_h2"] = rag2.reshape(b, k, l, d)
    return out
