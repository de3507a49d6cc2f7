"""Mesh-sharded flat L2 index: per-shard top-k + cross-chip merge over ICI.

This is the distributed component the reference never had (SURVEY.md
section 2.2 "Distributed communication backend: none... a first-class new
component, not a port"): reference-panel rows are sharded across the mesh's
``index`` axis, each chip searches its resident shard with the fused Pallas
kernel (ops/l2_topk_pallas.py), per-shard candidates carry *global* row ids,
and an ``all_gather`` of the tiny [B, k] candidate sets over ICI feeds a
final top-k merge.  k*shards candidates per query always contain the true
global top-k, so the result is exact.

An alternative ``ppermute`` ring merge (log- or linear-step) is sketched in
BASELINE.json's north star; for the candidate sizes here (k <= 16, shards
<= 256) the all-gather merge is bandwidth-trivial, so it is the default.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import l2_ref
from ..ops.l2_topk_pallas import (MAX_K, l2_topk_pallas, pack_planar,
                                  planar_unpack)
from ..parallel.mesh import INDEX_AXIS


def _local_topk(queries, vectors, norms, k, use_pallas, pack=1,
                d_real=None):
    # A shard can contribute at most its own row count: clamp the local
    # top-k when k > rows_per_shard (small shards under a wide mesh) and
    # pad the candidate set back to [B, k] with the (+inf, 0) filler the
    # streaming paths use — the cross-shard merge then sees fixed-width
    # sets and filler never outranks a real candidate.
    k_local = min(k, vectors.shape[0])
    if k_local < k:
        vals, ids = _local_topk(queries, vectors, norms, k_local,
                                use_pallas, pack=pack, d_real=d_real)
        padw = ((0, 0), (0, k - k_local))
        return (jnp.pad(vals, padw, constant_values=jnp.inf),
                jnp.pad(ids, padw, constant_values=0))
    if k > MAX_K:
        # Above the kernel's 128-lane top-k cap: per-shard streaming scan
        # (arbitrary k, bounded memory), merged over ICI like any other
        # per-shard candidate set.
        unpack = ((lambda c: planar_unpack(c, pack, d_real))
                  if pack > 1 else None)
        return l2_ref.l2_topk_streaming(queries, vectors, k, r_norms=norms,
                                        unpack=unpack)
    if pack > 1 and use_pallas:
        return l2_topk_pallas(queries, vectors, norms, k, pack=pack)
    if pack > 1:  # XLA path: unpack the (1/pack-size) local shard
        vectors = planar_unpack(vectors, pack, d_real).astype(jnp.float32)
        queries = queries.astype(jnp.float32)
    if use_pallas:
        return l2_topk_pallas(queries, vectors, norms, k)
    d = l2_ref.l2_distances(queries, vectors, r_norms=norms)
    return l2_ref.topk_smallest(d, k)


def _merge_candidates(cat_vals, cat_gids, k):
    """Exact top-k over concatenated candidates with the same ascending-id
    tie-break as the local kernels (ops/l2_ref.merge_topk_smallest)."""
    return l2_ref.merge_topk_smallest(cat_vals, cat_gids, k)


def _ring_merge(vals, gids, k: int, axis: str):
    """ppermute ring merge: S-1 neighbour exchanges of the [B, k] running
    candidate set instead of one [B, S*k] all_gather.  Same exact result;
    peak per-device candidate memory stays [B, 2k] regardless of shard
    count (the all_gather variant grows linearly in S)."""
    s = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % s) for i in range(s)]

    def step(carry, _):
        best_v, best_g, cur_v, cur_g = carry
        cur_v = jax.lax.ppermute(cur_v, axis, perm)
        cur_g = jax.lax.ppermute(cur_g, axis, perm)
        bv, bg = _merge_candidates(
            jnp.concatenate([best_v, cur_v], axis=1),
            jnp.concatenate([best_g, cur_g], axis=1), k)
        return (bv, bg, cur_v, cur_g), None

    (bv, bg, _, _), _ = jax.lax.scan(
        step, (vals, gids, vals, gids), None, length=s - 1)
    return bv, bg


def _sharded_search_body(queries, vectors, norms, *, k: int, axis: str,
                         use_pallas: bool, merge: str = "all_gather",
                         pack: int = 1, d_real: int | None = None):
    """shard_map body: runs per device with shard-local vectors/norms."""
    rows_per_shard = vectors.shape[0]
    my_shard = jax.lax.axis_index(axis)
    vals, ids = _local_topk(queries, vectors, norms, k, use_pallas,
                            pack=pack, d_real=d_real)
    gids = ids + my_shard * rows_per_shard
    if merge == "ring":
        return _ring_merge(vals, gids, k, axis)
    # Tiny [B, k] candidates: gather every shard's over ICI, merge exactly.
    all_vals = jax.lax.all_gather(vals, axis)   # [S, B, k]
    all_gids = jax.lax.all_gather(gids, axis)
    b = queries.shape[0]
    cat_vals = jnp.moveaxis(all_vals, 0, 1).reshape(b, -1)  # [B, S*k]
    cat_gids = jnp.moveaxis(all_gids, 0, 1).reshape(b, -1)
    return _merge_candidates(cat_vals, cat_gids, k)


class ShardedFlatL2Index:
    """Flat L2 index with rows sharded over a mesh axis.

    Rows are padded to an equal per-shard count; padding rows carry +inf
    norms.  ``search`` executes a single pjit'ed program: per-shard fused
    kernel + ICI candidate merge.
    """

    def __init__(self, mesh: Mesh, vectors: jax.Array, norms: jax.Array,
                 ntotal: int, axis: str = INDEX_AXIS, pack: int = 1,
                 d_real: int | None = None):
        self.mesh = mesh
        self.axis = axis
        self.vectors = vectors  # [N_pad, d] sharded over axis
        self.norms = norms      # [N_pad] sharded over axis
        self.ntotal = ntotal
        self.pack = pack        # > 1: planar-packed rows (1/pack HBM)
        self.d_real = d_real

    @classmethod
    def build(cls, mesh: Mesh, vectors, axis: str = INDEX_AXIS,
              dtype=jnp.float32, pack: int = 1) -> "ShardedFlatL2Index":
        vectors = np.asarray(vectors)
        n, d = vectors.shape
        n_shards = mesh.shape[axis]
        per = -(-n // n_shards)
        n_pad = per * n_shards
        norms = (vectors.astype(np.float32) ** 2).sum(-1)
        vpad = np.zeros((n_pad, d), dtype=vectors.dtype)
        vpad[:n] = vectors
        npad = np.full(n_pad, np.inf, np.float32)
        npad[:n] = norms
        if pack > 1:
            # Planar-packed shards: 1/pack the HBM per chip — the
            # sharding and the packing multiply (biobank-scale panels).
            hi = 1 << (8 // pack)
            if vectors.min() < 0 or vectors.max() >= hi:
                raise ValueError(f"pack={pack} admits values in "
                                 f"[0, {hi})")
            store = np.asarray(pack_planar(vpad.astype(np.int8), pack))
        else:
            store = vpad.astype(dtype)
        vsh = jax.device_put(store, NamedSharding(mesh, P(axis)))
        nsh = jax.device_put(npad, NamedSharding(mesh, P(axis)))
        return cls(mesh, vsh, nsh, ntotal=n, axis=axis, pack=pack,
                   d_real=d if pack > 1 else None)

    def search(self, queries, k: int, use_pallas: bool | None = None,
               merge: str = "all_gather") -> tuple[jax.Array, jax.Array]:
        """``merge``: "all_gather" (one collective, [B, S*k] concatenated
        candidates) or "ring" (S-1 ppermute steps, [B, 2k] peak)."""
        if use_pallas is None:
            # Same routing rule as FlatL2Index.search, on the per-shard
            # [B, N_local] workload.
            from .flat import FlatL2Index

            on_tpu = all(dev.platform == "tpu"
                         for dev in self.mesh.devices.flat)
            local_rows = self.vectors.shape[0] // self.mesh.shape[self.axis]
            b = np.asarray(queries).shape[0]
            use_pallas = (on_tpu
                          and 4 * b * local_rows > FlatL2Index._PALLAS_BYTES)
        q = (jnp.asarray(queries) if self.pack > 1
             else jnp.asarray(queries, dtype=self.vectors.dtype))
        body = partial(_sharded_search_body, k=k, axis=self.axis,
                       use_pallas=use_pallas, merge=merge,
                       pack=self.pack, d_real=self.d_real)
        fn = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(self.axis), P(self.axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        q_rep = jax.device_put(q, NamedSharding(self.mesh, P()))
        return jax.jit(fn)(q_rep, self.vectors, self.norms)
