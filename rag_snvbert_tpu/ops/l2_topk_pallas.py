"""Fused Pallas TPU kernel: exact L2 k-NN = tiled distance matmul + streaming top-k.

This is the TPU-native replacement for the reference's FAISS ``IndexFlatL2``
search (build_ref_db_l2.py:89-93, rag_train_dataset.py:129-137) and its
in-training ``torch.cdist + topk(largest=False)`` hot path
(src/dataset/embedding_rag_dataset.py:392-402).

Design (SURVEY.md section 7):
  - distance via the norm expansion ``|q|^2 - 2 q.R^T + |r|^2`` so the only
    O(B*N*d) work is an MXU matmul;
  - the feature dimension is tiled (grid axis ``kd``) and partial dot
    products accumulate in a VMEM scratch — this makes the kernel work for
    the embedding-space index where d = L*D ~ 4e5 floats;
  - reference rows are tiled (grid axis ``j``) and a running top-k per query
    tile is maintained in VMEM across tiles (streaming k-best) — the full
    [B, N] distance matrix never exists in memory;
  - ties broken by ascending reference id, matching the stable order of
    ``jax.lax.top_k`` on negated distances (the oracle in ops/l2_ref.py).

Performance note (measured, v5e, N=664k, d=2040, k=10, batch 1024): the
kernel runs at ~12-13% MXU regardless of tile shape — the cost is the
k-pass extraction merge (k passes over every distance on the VPU), not the
matmul or grid overhead.  FlatL2Index.search therefore routes to the XLA
matmul + top_k path (34% MXU) whenever [B, N] is affordable and reserves
this kernel for the memory-constrained regime; a selection-network merge
is the known follow-up.

Padding contract (handled by the wrapper):
  - queries padded to a multiple of the query tile with zeros;
  - refs padded to a multiple of the ref tile with zeros AND ``r_norms``
    padded with +inf so padded rows can never enter the top-k;
  - d padded to a multiple of the d tile with zeros (exact distances are
    unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_LANES = 128  # top-k scratch lane width (k <= 128 supported)
_ID_SENTINEL = 2**30  # plain int: a module-level jnp scalar would be a captured constant


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _l2_topk_kernel(q_ref, r_ref, rn_ref, vals_ref, ids_ref,
                    acc, qn, top_vals, top_ids, *, k: int, tn: int):
    j = pl.program_id(1)
    kd = pl.program_id(2)
    nn = pl.num_programs(1)
    nd = pl.num_programs(2)

    @pl.when(kd == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(jnp.logical_and(j == 0, kd == 0))
    def _():
        top_vals[:] = jnp.full_like(top_vals, jnp.inf)
        top_ids[:] = jnp.zeros_like(top_ids)
        qn[:] = jnp.zeros_like(qn)

    q = q_ref[:].astype(jnp.float32)  # [TQ, TD]

    # Query norms accumulate over d-tiles during the first ref tile only;
    # the scratch is reused for every later ref tile of the same query tile.
    @pl.when(j == 0)
    def _():
        qn[:] += jnp.sum(q * q, axis=1, keepdims=True)

    # MXU: partial dot products q @ r^T over this d tile.  HIGHEST
    # precision keeps f32 inputs exact (multi-pass); bf16 inputs are
    # single-pass either way, so the hot genotype/embedding paths pay
    # nothing and float32 vectors keep FAISS-grade exactness.
    acc[:] += jax.lax.dot_general(
        q, r_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # After the last d tile: form this ref tile's distances and merge them
    # into the running top-k.
    @pl.when(kd == nd - 1)
    def _():
        dist = jnp.maximum(qn[:] - 2.0 * acc[:] + rn_ref[:], 0.0)
        tq = dist.shape[0]
        ids_tile = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1)

        vals = jnp.concatenate([top_vals[:], dist], axis=1)        # [TQ, 128+TN]
        ids = jnp.concatenate([top_ids[:], ids_tile], axis=1)

        # k-step selection merge: extract the minimum k times, breaking
        # ties by the smallest reference id.  k is static and small, so the
        # loop unrolls onto the VPU.
        sel_vals = []
        sel_ids = []
        for _t in range(k):
            m = jnp.min(vals, axis=1, keepdims=True)               # [TQ, 1]
            cand = jnp.where(vals == m, ids, _ID_SENTINEL)
            sid = jnp.min(cand, axis=1, keepdims=True)             # [TQ, 1]
            sel_vals.append(m)
            sel_ids.append(sid)
            vals = jnp.where(ids == sid, jnp.inf, vals)

        pad = _K_LANES - k
        new_vals = jnp.concatenate(
            sel_vals + [jnp.full((tq, pad), jnp.inf, jnp.float32)], axis=1)
        new_ids = jnp.concatenate(
            sel_ids + [jnp.zeros((tq, pad), jnp.int32)], axis=1)
        top_vals[:] = new_vals
        top_ids[:] = new_ids

        @pl.when(j == nn - 1)
        def _():
            vals_ref[:] = top_vals[:]
            ids_ref[:] = top_ids[:]


@functools.partial(jax.jit, static_argnames=("k", "tq", "tn", "td", "interpret"))
def l2_topk_pallas(queries: jax.Array, refs: jax.Array, r_norms: jax.Array,
                   k: int, tq: int = 256, tn: int = 512, td: int = 512,
                   interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2 with the fused Pallas kernel.

    Args:
      queries: ``[B, d]`` float array.
      refs: ``[N, d]`` float array (same d).
      r_norms: ``[N]`` f32 squared norms of refs (precomputed; pass +inf for
        rows that must never be retrieved, e.g. padding).
      k: number of neighbours (1 <= k <= 128).

    Returns:
      (dists ``[B, k]`` f32 squared distances, ids ``[B, k]`` int32), sorted
      ascending, ties broken by ascending id.
    """
    assert 1 <= k <= _K_LANES, f"k={k} out of range (max {_K_LANES})"
    b, d = queries.shape
    n, d2 = refs.shape
    assert d == d2 and r_norms.shape == (n,)

    tq = min(tq, _round_up(max(b, 8), 8))
    tn = min(tn, _round_up(max(n, 128), 128))
    td = min(td, _round_up(max(d, 128), 128))

    bp, np_, dp = _round_up(b, tq), _round_up(n, tn), _round_up(d, td)
    qp = jnp.pad(queries, ((0, bp - b), (0, dp - d)))
    rp = jnp.pad(refs, ((0, np_ - n), (0, dp - d)))
    # 2D [1, N] layout: 1D f32 operands trip XLA/Mosaic tiling mismatches.
    rnp = jnp.pad(r_norms.astype(jnp.float32), (0, np_ - n),
                  constant_values=jnp.inf)[None, :]

    grid = (bp // tq, np_ // tn, dp // td)

    vals, ids = pl.pallas_call(
        functools.partial(_l2_topk_kernel, k=k, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, td), lambda i, j, kd: (i, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, td), lambda i, j, kd: (j, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kd: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, _K_LANES), lambda i, j, kd: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, _K_LANES), lambda i, j, kd: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((bp, _K_LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, tn), jnp.float32),       # dot-product accumulator
            pltpu.VMEM((tq, 1), jnp.float32),        # query norms
            pltpu.VMEM((tq, _K_LANES), jnp.float32),  # running top-k values
            pltpu.VMEM((tq, _K_LANES), jnp.int32),    # running top-k ids
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp,
            bytes_accessed=4 * (bp * dp + (bp // tq) * np_ * dp + bp * _K_LANES),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rp, rnp)

    return vals[:b, :k], ids[:b, :k]
