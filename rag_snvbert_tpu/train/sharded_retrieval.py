"""Sharded in-training retrieval: the reference-panel rows of a window's
search context live sharded across the mesh's ``index`` axis.

For chr21-scale panels (2008 haplotypes) the per-window context fits one
chip and train/retrieval.py keeps it replicated; this module is the
scale-out path (SURVEY.md section 7 step 6, ROADMAP item 4) for panels
whose masked-embedding matrix [N, L*D] exceeds one chip's HBM:

  - the context is ENCODED shard-locally — each device embeds only its own
    reference rows under shard_map, so the refresh generates no cross-chip
    traffic at all (SURVEY.md section 5: "each shard re-encodes its own
    rows — no traffic — then barrier");
  - search runs per shard and the tiny [B, k] candidate sets merge exactly
    over ICI — via one ``all_gather`` (default) or a ``ppermute`` ring
    (lower peak memory at high shard counts, see index/sharded.py);
  - the retrieved COMPLETE tokens stay replicated (ints, [N, L] — a few
    hundred MB at worst), so the gradient-bearing re-embedding gather is
    local;
  - batches may simultaneously be sharded over the ``data`` axis: each
    data-parallel group searches its local queries against every index
    shard (the candidate merge runs within the index axis only), so DP x
    index-sharded training is a single jitted program (train/step.py
    dispatches here whenever the ctx is a ShardedWindowRefContext).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.sharded import _sharded_search_body
from ..parallel.mesh import DATA_AXIS, INDEX_AXIS
from .retrieval import apply_token_mask


@struct.dataclass
class ShardedWindowRefContext:
    """Sharded-search side + replicated result side of one window."""

    ref_emb_flat: jax.Array   # [N_pad, L*D] sharded over the index axis
    ref_norms: jax.Array      # [N_pad] sharded (+inf on padding rows)
    ref_tokens: jax.Array     # [N_pad, L] replicated complete tokens
    ref_af: jax.Array         # [L] replicated


def _param_spec_key(params: Any, mesh: Mesh):
    """(treedef, spec leaves) for the params argument of the encode
    shard_map — P() everywhere unless the mesh runs tensor parallelism,
    in which case encoder leaves carry their Megatron placement
    (parallel/tp.py) so TP x sharded-index composes.  The embed stage
    itself only touches replicated leaves (embeddings/fusion); the
    TP-sharded encoder leaves merely pass through unused.  Both parts
    are hashable, so the jitted shard_map stays lru-cacheable."""
    from ..parallel.mesh import MODEL_AXIS

    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        from ..parallel.tp import spec_for_path

        spec_tree = jax.tree_util.tree_map_with_path(spec_for_path, params)
    else:
        spec_tree = jax.tree.map(lambda _: P(), params)
    leaves, treedef = jax.tree_util.tree_flatten(
        spec_tree, is_leaf=lambda x: isinstance(x, P))
    return treedef, tuple(leaves)


@functools.lru_cache(maxsize=None)
def _encode_jit(embed_fn: Callable, mesh: Mesh, axis: str, dtype,
                ptreedef=None, pspecs: tuple = ()):
    """Cached jitted shard-local encoder (params as argument, never a
    closure: closed-over device arrays lower as captured HLO constants)."""

    def local_encode(params, toks_local, valid_local, af, wmask):
        masked = apply_token_mask(toks_local, wmask)
        af_exp = jnp.broadcast_to(af[None, :], masked.shape)
        emb = embed_fn(params, masked, af_exp, True)
        emb = jax.lax.stop_gradient(emb).astype(dtype)
        flat = emb.reshape(emb.shape[0], -1)
        norms = jnp.sum(flat.astype(jnp.float32) ** 2, axis=-1)
        norms = jnp.where(valid_local, norms, jnp.inf)
        return flat, norms

    pspec = (P() if ptreedef is None
             else jax.tree_util.tree_unflatten(ptreedef, list(pspecs)))
    fn = jax.shard_map(local_encode, mesh=mesh,
                       in_specs=(pspec, P(axis), P(axis), P(), P()),
                       out_specs=(P(axis), P(axis)),
                       check_vma=False)
    return jax.jit(fn)


def encode_window_refs_sharded(embed_fn: Callable, params: Any,
                               ref_tokens: jax.Array, ref_af: jax.Array,
                               window_mask: jax.Array, mesh: Mesh,
                               valid: jax.Array | None = None,
                               axis: str = INDEX_AXIS,
                               dtype=jnp.bfloat16) -> ShardedWindowRefContext:
    """Build a sharded window context: shard-local masked-ref encoding.

    ``ref_tokens`` [N, L] is padded so N divides the axis size; each shard
    embeds only its rows (no collective in the refresh path).
    """
    n, l = ref_tokens.shape
    n_shards = mesh.shape[axis]
    per = -(-n // n_shards)
    n_pad = per * n_shards
    toks = jnp.pad(ref_tokens, ((0, n_pad - n), (0, 0)))
    valid_full = jnp.pad(
        valid if valid is not None else jnp.ones(n, bool),
        (0, n_pad - n), constant_values=False)

    toks_sh = jax.device_put(toks, NamedSharding(mesh, P(axis)))
    valid_sh = jax.device_put(valid_full, NamedSharding(mesh, P(axis)))
    af_rep = jax.device_put(jnp.asarray(ref_af), NamedSharding(mesh, P()))
    mask_rep = jax.device_put(jnp.asarray(window_mask),
                              NamedSharding(mesh, P()))

    ptreedef, pspecs = _param_spec_key(params, mesh)
    flat, norms = _encode_jit(embed_fn, mesh, axis, dtype,
                              ptreedef, pspecs)(
        params, toks_sh, valid_sh, af_rep, mask_rep)
    toks_rep = jax.device_put(toks, NamedSharding(mesh, P()))
    return ShardedWindowRefContext(ref_emb_flat=flat, ref_norms=norms,
                                   ref_tokens=toks_rep, ref_af=af_rep)


def retrieve_sharded(embed_fn: Callable, params: Any, batch: dict,
                     ctx: ShardedWindowRefContext, mesh: Mesh, k: int = 1,
                     axis: str = INDEX_AXIS,
                     data_axis: str | None = DATA_AXIS,
                     merge: str = "all_gather",
                     deterministic: bool = True,
                     rngs: dict | None = None) -> dict:
    """Differentiable retrieval against a sharded window context.

    Same contract as train/retrieval.retrieve: adds rag_emb_h{1,2}
    [B, K, L, D] with gradient through query embedding and re-embedding;
    the search itself is stop-grad and runs per shard with an exact ICI
    candidate merge.  Jit-safe: call from inside the train step — the
    shard_map composes with the surrounding pjit program.

    ``data_axis``: mesh axis the batch is sharded over (None = replicated
    queries).  ``merge``: "all_gather" | "ring" (index/sharded.py).
    """

    def embed(tokens, af):
        return embed_fn(params, tokens, af, deterministic, rngs)

    af = batch["af"]
    b = batch["hap_1"].shape[0]
    # Stacked [2B, L] embed + search for both haplotypes (one program).
    toks = jnp.concatenate([batch["hap_1"], batch["hap_2"]], axis=0)
    q = embed(toks, jnp.concatenate([af, af], axis=0))  # [2B, L, D] w/ grad
    l, d_model = q.shape[1], q.shape[2]

    qspec = P(data_axis) if data_axis and data_axis in mesh.shape else P()
    search = jax.shard_map(
        functools.partial(_sharded_search_body, k=k, axis=axis,
                          use_pallas=False, merge=merge),
        mesh=mesh,
        in_specs=(qspec, P(axis), P(axis)),
        out_specs=(qspec, qspec),
        check_vma=False)

    qf = jax.lax.stop_gradient(q).astype(ctx.ref_emb_flat.dtype)
    _, ids = search(qf.reshape(2 * b, -1), ctx.ref_emb_flat, ctx.ref_norms)

    all_ids = ids.reshape(-1)
    ret_tokens = ctx.ref_tokens[all_ids]
    ret_af = jnp.broadcast_to(ctx.ref_af[None, :], ret_tokens.shape)
    ret_emb = embed(ret_tokens, ret_af)    # gradient flows here
    rag1, rag2 = jnp.split(ret_emb, 2, axis=0)
    out = dict(batch)
    out["rag_emb_h1"] = rag1.reshape(b, k, l, d_model)
    out["rag_emb_h2"] = rag2.reshape(b, k, l, d_model)
    out["query_emb"] = q   # reused by the model forward (one embed total)
    return out
