"""XLA reference implementations of exact L2 / Hamming k-NN search.

These are the correctness oracles for the fused Pallas kernels in
``l2_topk_pallas.py`` — plain jnp code that XLA compiles well enough for
small problems, written once so every other implementation has a parity
target (the reference never had one: FAISS flat *is* exact, so the oracle
check it lacked is a straight tie-aware comparison, BASELINE.md).

Distances are **squared** L2, matching faiss.IndexFlatL2 semantics
(the reference's torch.cdist path takes a sqrt, but top-k order is
identical; callers that need metric distances can sqrt).

Tie-break rule (documented per SURVEY.md section 7 "hard parts"): equal
distances rank by ascending row id — `lax.top_k` on negated distances is
stable and returns the earliest index first, and the Pallas kernel
implements the same rule explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, computed in f32."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


def l2_distances(queries: jax.Array, refs: jax.Array,
                 q_norms: jax.Array | None = None,
                 r_norms: jax.Array | None = None) -> jax.Array:
    """Pairwise squared L2 distances ``[B, N]`` via the norm expansion
    ``|q|^2 - 2 q.r + |r|^2`` — one MXU matmul plus rank-1 updates."""
    if q_norms is None:
        q_norms = squared_norms(queries)
    if r_norms is None:
        r_norms = squared_norms(refs)
    # HIGHEST matmul precision keeps f32 vectors exact on the MXU (default
    # passes round to bf16 and can swap near-tied neighbours); bf16 inputs
    # are single-pass either way.
    dots = jnp.dot(queries.astype(jnp.float32), refs.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    d = q_norms[:, None] - 2.0 * dots + r_norms[None, :]
    return jnp.maximum(d, 0.0)


def topk_smallest(dists: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k smallest values per row -> (values [B,k], ids [B,k])."""
    neg_vals, ids = jax.lax.top_k(-dists, k)
    return -neg_vals, ids


def merge_topk_smallest(cat_vals: jax.Array, cat_ids: jax.Array,
                        k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over concatenated (vals, ids) candidate sets with the
    ascending-id tie-break: stable sort by id, then top_k on negated
    values (used by the sharded ICI merge and the streaming searches)."""
    order = jnp.argsort(cat_ids, axis=1, stable=True)
    v1 = jnp.take_along_axis(cat_vals, order, axis=1)
    g1 = jnp.take_along_axis(cat_ids, order, axis=1)
    neg_vals, pos = jax.lax.top_k(-v1, k)
    return -neg_vals, jnp.take_along_axis(g1, pos, axis=1)


def l2_topk(queries: jax.Array, refs: jax.Array, k: int,
            r_norms: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2. Reference implementation (oracle)."""
    d = l2_distances(queries, refs, r_norms=r_norms)
    return topk_smallest(d, k)


def l2_topk_streaming(queries: jax.Array, refs: jax.Array, k: int,
                      r_norms: jax.Array | None = None,
                      chunk: int = 65536, unpack=None
                      ) -> tuple[jax.Array, jax.Array]:
    """Exact L2 k-NN for ARBITRARY k without materializing [B, N]: scan
    reference rows in ``chunk`` blocks, merging a running top-k per block
    (same shape as hamming_topk_streaming).

    The fused Pallas kernel caps k at its 128 top-k lanes
    (l2_topk_pallas.MAX_K); FAISS takes any k (reference
    build_ref_db_l2.py:89-93), so searches above the cap route here —
    peak memory is [B, chunk] + [chunk, d] regardless of N, which also
    keeps chromosome-scale large-k searches inside HBM.

    ``unpack``: optional per-chunk map from stored rows to the search
    domain (planar-packed int8 -> values), so packed indexes stream
    without ever materializing the full unpacked matrix.  When fewer
    than k valid rows exist, the tail is (+inf, 0) filler.
    """
    n = refs.shape[0]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    # With ``unpack`` and no precomputed norms, compute norms per chunk
    # inside the scan body — precomputing squared_norms(unpack(refs)) would
    # materialize the full unpacked matrix in one shot, breaking the
    # bounded-memory contract above (round-4 advisor finding).
    norms_in_body = r_norms is None and unpack is not None
    if r_norms is None and not norms_in_body:
        r_norms = squared_norms(refs)
    if norms_in_body:
        rn = jnp.zeros(n_pad, jnp.float32)       # recomputed per chunk
    else:
        rn = jnp.pad(r_norms, (0, n_pad - n), constant_values=jnp.inf)
    rp = jnp.pad(refs, ((0, n_pad - n), (0, 0)))
    rp = rp.reshape(n_chunks, chunk, refs.shape[1])
    rn = rn.reshape(n_chunks, chunk)
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    qf = queries.astype(jnp.float32)
    q_norms = jnp.sum(qf * qf, axis=-1)
    b, kc = qf.shape[0], min(k, chunk)

    init = (jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.zeros((b, k), jnp.int32))

    def body(carry, xs):
        best_v, best_i = carry
        r_c, rn_c, base = xs
        rc = r_c if unpack is None else unpack(r_c)
        rcf = rc.astype(jnp.float32)
        if norms_in_body:
            # padded rows (global id >= n) get +inf so they sort last,
            # matching the precomputed path's inf padding
            valid = (base + jnp.arange(chunk)) < n
            rn_c = jnp.where(valid, jnp.sum(rcf * rcf, axis=-1), jnp.inf)
        d = l2_distances(qf, rcf, q_norms=q_norms, r_norms=rn_c)
        v, i = topk_smallest(d, kc)
        bv, bi = merge_topk_smallest(
            jnp.concatenate([best_v, v], axis=1),
            jnp.concatenate([best_i, i + base], axis=1), k)
        return (bv, bi), None

    (bv, bi), _ = jax.lax.scan(body, init, (rp, rn, bases))
    return bv, bi


def masked_l2_distances(queries: jax.Array, refs: jax.Array,
                        dim_mask: jax.Array) -> jax.Array:
    """Squared L2 over a subset of dimensions (dim_mask: [d] 1=keep).

    Replaces the reference's rebuild-per-mask pattern
    (partial_faiss_intersect.py:82-111 drops masked columns from query and
    refs and builds a temporary index) with one masked distance:
      sum_m (q_i - r_i)^2 = |q . m|^2 - 2 (q . m) @ R^T + (R*R) @ m
    The last term is itself an MXU matmul — no index rebuild needed.
    """
    m = dim_mask.astype(jnp.float32)
    qm = queries.astype(jnp.float32) * m[None, :]
    rf = refs.astype(jnp.float32)
    q_norms = jnp.sum(qm * qm, axis=-1)
    r_norms_m = jnp.dot(rf * rf, m, preferred_element_type=jnp.float32)
    dots = jnp.dot(qm, rf.T, preferred_element_type=jnp.float32)
    return jnp.maximum(q_norms[:, None] - 2.0 * dots + r_norms_m[None, :], 0.0)


def masked_l2_topk(queries: jax.Array, refs: jax.Array, dim_mask: jax.Array,
                   k: int) -> tuple[jax.Array, jax.Array]:
    return topk_smallest(masked_l2_distances(queries, refs, dim_mask), k)


# --------------------------------------------------------------------------
# Hamming (binary) search over bit-packed haplotypes
# (reference: faiss.IndexBinaryFlat via np.packbits,
#  test_faiss_intersect.py:164-183).
# --------------------------------------------------------------------------

def pack_bits(x: jax.Array) -> jax.Array:
    """Pack 0/1 int array [..., d] into uint32 words [..., ceil(d/32)].

    Bit i of word w holds element w*32+i (LSB-first layout; both sides of a
    Hamming search use the same packing so the layout is internal).
    """
    d = x.shape[-1]
    pad = (-d) % 32
    xp = jnp.pad(x.astype(jnp.uint32), [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xp = xp.reshape(*x.shape[:-1], (d + pad) // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(xp << shifts, axis=-1, dtype=jnp.uint32)


def pack_bits_np(x: "np.ndarray") -> "np.ndarray":
    """Host-side pack_bits (same LSB-first uint32 layout) for offline
    index builds: the device version expands [N, d] to a [N, d_pad]
    uint32 intermediate — ~5.4 GB at chromosome scale (664k x 2040) and
    an HBM OOM when built eagerly — while the host has the RAM and the
    build is not latency-sensitive."""
    import numpy as np

    d = x.shape[-1]
    pad = (-d) % 32
    xp = np.pad(np.asarray(x, np.uint8), [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    # np.packbits is bitorder-per-byte; little-endian uint32 view of the
    # 4 packed bytes reproduces the LSB-first 32-bit layout.
    words = np.packbits(xp.reshape(*x.shape[:-1], (d + pad) // 32, 4, 8),
                        axis=-1, bitorder="little")
    return words.reshape(*x.shape[:-1], -1).view("<u4").reshape(
        *x.shape[:-1], (d + pad) // 32)


def hamming_distances(q_packed: jax.Array, r_packed: jax.Array) -> jax.Array:
    """Pairwise Hamming distances [B, N] via XOR + popcount on the VPU."""
    x = jnp.bitwise_xor(q_packed[:, None, :], r_packed[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_topk(q_packed: jax.Array, r_packed: jax.Array,
                 k: int) -> tuple[jax.Array, jax.Array]:
    d = hamming_distances(q_packed, r_packed)
    return topk_smallest(d, k)


def hamming_topk_streaming(q_packed: jax.Array, r_packed: jax.Array, k: int,
                           valid: jax.Array | None = None,
                           chunk: int = 8192
                           ) -> tuple[jax.Array, jax.Array]:
    """Exact Hamming k-NN without materializing [B, N, words]: scan the
    reference rows in ``chunk``-sized blocks, keeping a running top-k
    merged with merge_topk_smallest (chromosome-scale panels would
    otherwise need hundreds of GB — the [B, N, W] XOR tensor of the direct
    path).  Same results and tie-break as hamming_topk."""
    b = q_packed.shape[0]
    n, w = r_packed.shape
    sentinel = jnp.iinfo(jnp.int32).max
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    rp = jnp.pad(r_packed, ((0, n_pad - n), (0, 0)))
    vp = jnp.pad(valid if valid is not None else jnp.ones(n, bool),
                 (0, n_pad - n), constant_values=False)
    rp = rp.reshape(n_chunks, chunk, w)
    vp = vp.reshape(n_chunks, chunk)
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)

    init = (jnp.full((b, k), sentinel, jnp.int32),
            jnp.zeros((b, k), jnp.int32))

    def body(carry, xs):
        best_v, best_i = carry
        r_c, v_c, base = xs
        d = hamming_distances(q_packed, r_c)
        d = jnp.where(v_c[None, :], d, sentinel)
        v, i = topk_smallest(d, min(k, chunk))
        bv, bi = merge_topk_smallest(
            jnp.concatenate([best_v, v], axis=1),
            jnp.concatenate([best_i, i + base], axis=1), k)
        return (bv, bi), None

    (bv, bi), _ = jax.lax.scan(body, init, (rp, vp, bases))
    return bv, bi
