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
    [B, N] distance matrix never exists in memory.

Merge design (round 2, replacing the k-pass extraction that capped the
kernel at ~12% MXU):
  - distances are packed into *sortable int32 keys*: the f32 distance bits
    (monotonic under int32 comparison for non-negative floats) with the low
    _ID_BITS (11) mantissa bits replaced by the lane id.  Keys are unique per
    row, so a
    single ``where(keys == min)`` knockout is exact, and the min itself
    encodes both the (quantized) distance and the within-tile id;
  - the running top-k buffer stores keys with the id bits cleared (pure
    quantized distance) plus a parallel global-id plane, kept sorted
    ascending.  Its k-th entry is the selection threshold tau;
  - per ref tile the common path is: form distances, compare against tau,
    and only if some row has a candidate enter a while-loop that extracts
    the row-min key, knocks it out, and shift-inserts it into the sorted
    buffer.  After warm-up the expected number of new top-k candidates per
    tile is ~k/j (j = tile index), so the loop runs 0-2 iterations instead
    of k fixed extraction passes over every distance;
  - ordering is by distance *quantized to 2048 ULP* (relative error
    <= 2^-12 ~ 2.4e-4), ties broken by ascending reference id (lane bits
    within a tile, first-tile-wins across tiles).  For integer-dtype
    vectors distances are exact int32 (lossless below the 2^20 cap); for
    integer-valued floats the quantization is lossless below 8192; for
    float embeddings the 2^-12 reordering window is below the
    norm-expansion's own cancellation noise (the same expansion FAISS
    uses).  Returned distances are the quantized values.

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

_K_LANES = 128   # top-k buffer lane width (k <= 128 supported)
# Public cap: index wrappers route k > MAX_K to the streaming XLA path
# (ops/l2_ref.l2_topk_streaming) — FAISS-parity arbitrary k.
MAX_K = _K_LANES
_ID_BITS = 11    # default low mantissa bits of each key carrying the
# within-tile lane id.  11 bits allow 2048-lane ref tiles — each doubling
# of the ref tile halves the merge-gate fires, measured round 3 as the
# dominant epilogue cost (tn 512 -> 1024 -> 2048: 20.9 -> 16.5 -> 13.7
# ms/batch).  Cost of the wider id field: the f32 distance quantum is
# 2^(id_bits+1) ULP (relative error <= 2^-(23-id_bits), still under
# norm-expansion noise at 11-12 bits) and integer distances stay
# lossless below the 2^(31-id_bits) cap.  The wrapper widens id_bits
# automatically when tn needs it (tn=4096 -> 12 — only VMEM-feasible
# with packed storage, where the ref tile is bytes not values).
_MAX_KEY = 2**31 - 1  # plain int: a jnp scalar would be a captured constant


class _Keys:
    """Key-packing constants for a given id field width (see module
    docstring).  Plain python ints — captured as immediates by Mosaic."""

    def __init__(self, id_bits: int):
        self.bits = id_bits
        self.id_mask = (1 << id_bits) - 1
        self.key_mask = ~self.id_mask     # clears id bits -> quantized dist
        self.inf_key = 0x7F800000 & self.key_mask  # +inf, id bits cleared
        # Integer path: distances clamp at this cap so (dist << id_bits)
        # never overflows; the cap doubles as the padding sentinel (a
        # capped key equals the buffer-init key, so capped rows are never
        # retrieved).
        self.int_dist_cap = _MAX_KEY >> id_bits
        self.int_inf_key = self.int_dist_cap << id_bits


_DEFAULT_KEYS = _Keys(_ID_BITS)
# Kept for external callers/tests that reference the default geometry.
_ID_MASK = _DEFAULT_KEYS.id_mask        # 0x7FF
_KEY_MASK = _DEFAULT_KEYS.key_mask
_INF_KEY = _DEFAULT_KEYS.inf_key
_INT_DIST_CAP = _DEFAULT_KEYS.int_dist_cap   # 0xFFFFF
_INT_INF_KEY = _DEFAULT_KEYS.int_inf_key


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def default_td(d: int, dtype) -> int:
    """The d-tile the wrapper picks by default (see l2_topk_pallas)."""
    td = 2048 if jnp.dtype(dtype).itemsize <= 2 else 1024
    return min(td, _round_up(max(d, 128), 128))


def default_tn(dtype) -> int:
    """Default ref-tile lanes: as wide as VMEM affords for the dtype —
    wider tiles mean fewer merge-gate fires (the dominant epilogue cost;
    see _ID_BITS).  int8 storage affords the full 2^ID_BITS lanes; f32 /
    bf16 tiles are 4x / 2x the bytes, so they cap lower to keep the
    double-buffered ref tile inside VMEM."""
    return 2048 if jnp.dtype(dtype).itemsize == 1 else 1024


def ref_alignment(d: int, dtype, tn: int | None = None) -> tuple[int, int]:
    """(n_multiple, d_padded) that make the wrapper's ref pads no-ops.

    Padding the [N, d] reference matrix *at build time* (rows with +inf
    norms, zero feature columns) saves a full per-call HBM round trip:
    the in-jit ``jnp.pad`` of a chromosome-scale int8 index (1.36 GB)
    measured ~3 ms of the 24 ms batch on v5e (tools/sweep_topk --prepad:
    42.7k -> 48.8k QPS)."""
    if tn is None:
        tn = default_tn(dtype)
    return tn, _round_up(max(d, 128), default_td(d, dtype))


def pack_planar(v, pack: int):
    """Planar bit-packing for the kernel's ``pack > 1`` path.

    ``v`` [N, d] with values in [0, 2^(8/pack)): returns int8 [N, D8]
    where D8 = round_up(ceil-free d/pack plane width, 128) and byte
    column j carries original columns {j + m*D8 : m < pack} at bit
    offset m*(8/pack).  The layout makes each extracted bit-plane a
    CONTIGUOUS block of original columns, so in-kernel unpacking needs
    no lane shuffles and queries stay in natural column order (block m
    of the query tile aligns with plane m).  Matches the semantics of
    the reference's packbits binary DB (test_faiss_intersect.py:164-183)
    while keeping search exact L2 on the MXU instead of Hamming on the
    VPU.  pack=8: binary genotypes (1 bit).  pack=4: dosage 0..3.
    pack=2: small ints 0..15 (<= 7 for query pre-doubling)."""
    assert pack in (2, 4, 8)
    v = jnp.asarray(v)
    n, d = v.shape
    bits = 8 // pack
    d8 = _round_up(max(_cdiv(d, pack), 128), 128)
    # Stay in uint8 end to end: a chromosome-scale matrix upcast to int32
    # would cost 4x the HBM of the data being packed.
    vp = jnp.pad(v.astype(jnp.uint8), ((0, 0), (0, d8 * pack - d)))
    planes = vp.reshape(n, pack, d8)
    packed = planes[:, 0, :]
    for m in range(1, pack):
        packed = packed | (planes[:, m, :] << (m * bits))
    return jax.lax.bitcast_convert_type(packed, jnp.int8)


@functools.partial(jax.jit, static_argnames=("pack", "d"))
def planar_unpack(packed: jax.Array, pack: int, d: int) -> jax.Array:
    """Inverse of pack_planar -> int8 [N, d] (XLA, for off-kernel paths:
    the CPU/XLA search fallback and cross-checks)."""
    bits = 8 // pack
    mask = (1 << bits) - 1
    p32 = packed.astype(jnp.int32)
    planes = [((p32 >> (m * bits)) & mask).astype(jnp.int8)
              for m in range(pack)]
    return jnp.concatenate(planes, axis=1)[:, :d]


@functools.partial(jax.jit, static_argnames=("pack",))
def planar_sq_norms(packed: jax.Array, pack: int) -> jax.Array:
    """[N] f32 squared norms of planar-packed vectors (one fused pass
    over the packed bytes — XLA keeps the plane extraction in registers)."""
    bits = 8 // pack
    mask = (1 << bits) - 1
    p32 = packed.astype(jnp.int32)
    acc = jnp.zeros((packed.shape[0],), jnp.int32)
    for m in range(pack):
        plane = (p32 >> (m * bits)) & mask
        acc = acc + jnp.sum(plane * plane, axis=1)
    return acc.astype(jnp.float32)


def _when(cond):
    """pl.when that accepts a Python bool: statically-true branches are
    inlined (the 2D grid drops the kd axis, making its conditions static)."""
    if isinstance(cond, bool):
        return (lambda f: f() if cond else None)
    return pl.when(cond)


def _l2_topk_kernel(q_ref, r_ref, rn_ref, vals_ref, ids_ref,
                    acc, qn, top_keys, top_ids, *, k: int, tn: int,
                    in_dtype, two_d: bool, kc: _Keys = _DEFAULT_KEYS):
    j = pl.program_id(1)
    nn = pl.num_programs(1)
    if two_d:
        # Single d tile: the kd grid axis is dropped entirely — a size-1
        # trailing grid dim measurably slows Mosaic's pipeline (probe:
        # 15.9 -> 10.3 ms on the bare matmul at N=664k, d=2048).
        kd, nd = 0, 1
    else:
        kd = pl.program_id(2)
        nd = pl.num_programs(2)
    integer = jnp.issubdtype(jnp.dtype(in_dtype), jnp.integer)
    acc_t = jnp.int32 if integer else jnp.float32

    # Norm-fused accumulation (round 3): the accumulator is seeded with
    # -|r|^2 instead of zero (same-cost write), and the wrapper pre-doubles
    # the queries, so after the d loop  acc = 2<q,r> - |r|^2  and the
    # distance is simply |q|^2 - acc.  This removes the rn-broadcast add
    # AND the 2x shift from the every-tile epilogue — the common path
    # becomes ONE compare + one any-reduce per element (the VPU epilogue,
    # not the MXU matmul, is what bounds this kernel at big d tiles).
    @_when(True if two_d else kd == 0)
    def _():
        acc[:] = jnp.zeros_like(acc) - rn_ref[:]

    inf_key = kc.int_inf_key if integer else kc.inf_key

    @_when(j == 0 if two_d else jnp.logical_and(j == 0, kd == 0))
    def _():
        top_keys[:] = jnp.full_like(top_keys, inf_key)
        top_ids[:] = jnp.zeros_like(top_ids)
        qn[:] = jnp.zeros_like(qn)

    # Query norms accumulate over d-tiles during the first ref tile only;
    # the scratch is reused for every later ref tile of the same query tile.
    # q_ref holds the PRE-DOUBLED queries, so this accumulates 4|q|^2; use
    # sites rescale the [TQ, 1] column (exact: /4 of a sum of even squares
    # for ints, an exponent bump for floats).
    @pl.when(j == 0)
    def _():
        qf = q_ref[:].astype(acc_t)
        qn[:] += jnp.sum(qf * qf, axis=1, keepdims=True)

    # MXU: partial dot products q @ r^T over this d tile, in the input
    # dtype (int8 runs on the double-rate integer MXU path with exact
    # int32 accumulation; bf16 single-pass; f32 uses HIGHEST for
    # FAISS-grade exactness).
    precision = (jax.lax.Precision.HIGHEST
                 if in_dtype == jnp.float32 else None)
    acc[:] += jax.lax.dot_general(
        q_ref[:], r_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
        precision=precision,
    )

    # After the last d tile: gate on "any candidate in this ref tile",
    # and only then form keys and merge.  The gate is the common path —
    # after the first few ref tiles almost every tile is a miss — and
    # thanks to the norm-fused accumulator it is ONE compare against a
    # per-row threshold plus one any-reduce:
    #   dist < tau_dist  ⇔  qn - acc < tau_dist  ⇔  acc > qn - tau_dist
    # with qn - tau_dist a [TQ, 1] column computed once per tile.  No
    # distance materialization, no key packing, no min-extraction.
    # (The round-2 epilogue formed packed keys + a min-reduce every
    # tile: ~10 ops/element, which at d-tile≈2048 rivals the whole int8
    # matmul's MXU time and capped the kernel at ~29% of int8 peak.)
    @_when(True if two_d else kd == nd - 1)
    def _():
        tq = acc.shape[0]
        tau = top_keys[:, k - 1 : k]                      # [TQ, 1] key space
        if integer:
            # Exact: keys compare as dist<<B|lane < tau_d<<B ⇔ dist<tau_d.
            tau_d = tau >> kc.bits
            thr = (qn[:] >> 2) - tau_d                    # [TQ, 1]
            gate = jnp.any(acc[:] > thr)
        else:
            # Conservative by one quantum: dist_bits&KEY_MASK < tau (int)
            # ⇒ dist_bits < tau + 2^B ⇒ dist < f32(tau + 2^B).  Spurious
            # fires (dist within one 2^_ID_BITS-ulp quantum past tau)
            # just run an empty merge.
            # Dropping dist's max(…, 0) clamp only widens the gate.  The
            # min against the +inf bits keeps the untouched-buffer case
            # (tau = _INF_KEY) at exactly +inf instead of a NaN pattern.
            tau_next = pltpu.bitcast(
                jnp.minimum(tau + (1 << kc.bits), kc.inf_key), jnp.float32)
            thr = 0.25 * qn[:] - tau_next                 # [TQ, 1]
            gate = jnp.any(acc[:] > thr)

        @pl.when(gate)
        def _():
            lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1)
            if integer:
                # Integer path: distances are exact int32; the key is
                # dist << ID_BITS | lane (lossless below the cap; padded
                # rows carry cap-valued norms, so their keys clamp to
                # inf_key and are excluded by the strict-< merge).
                dist = jnp.clip((qn[:] >> 2) - acc[:], 0, kc.int_dist_cap)
                keys = (dist << kc.bits) | lanes
            else:
                dist = jnp.maximum(0.25 * qn[:] - acc[:], 0.0)
                # Packed sortable keys: non-negative f32 bits are
                # monotonic under int32 comparison; the low 10 mantissa
                # bits become the lane id so keys are unique per row and
                # the min encodes (dist, id).
                keys = (pltpu.bitcast(dist, jnp.int32) & kc.key_mask) | lanes

            m0 = jnp.min(keys, axis=1, keepdims=True)     # [TQ, 1]
            li = jax.lax.broadcasted_iota(jnp.int32, (tq, _K_LANES), 1)

            def cond(carry):
                _, m, tau_c = carry
                # Strict <: buffer keys have zero id bits, so an equal
                # quantized distance keeps the incumbent (earlier tile =
                # smaller global id), preserving the ascending-id
                # tie-break.
                return jnp.any((m & kc.key_mask) < tau_c)

            def body(carry):
                keys_c, m, _ = carry
                qkey = m & kc.key_mask                      # [TQ, 1]
                gid = j * tn + (m & kc.id_mask)             # [TQ, 1]
                # Shift-insert into the sorted buffer.  Rows whose min is
                # not a real candidate (qkey >= tau) land at pos >= k and
                # only disturb the non-load-bearing tail lanes.
                pos = jnp.sum((top_keys[:] <= qkey).astype(jnp.int32),
                              axis=1, keepdims=True)      # [TQ, 1]
                sk = pltpu.roll(top_keys[:], 1, axis=1)
                si = pltpu.roll(top_ids[:], 1, axis=1)
                top_keys[:] = jnp.where(
                    li < pos, top_keys[:], jnp.where(li == pos, qkey, sk))
                top_ids[:] = jnp.where(
                    li < pos, top_ids[:], jnp.where(li == pos, gid, si))
                # Knock the extracted element out (keys unique per row).
                keys_n = jnp.where(keys_c == m, _MAX_KEY, keys_c)
                m_n = jnp.min(keys_n, axis=1, keepdims=True)
                return keys_n, m_n, top_keys[:, k - 1 : k]

            jax.lax.while_loop(cond, body, (keys, m0, tau))

        @pl.when(j == nn - 1)
        def _():
            if integer:
                vals_ref[:] = jnp.where(
                    top_keys[:] >= kc.int_inf_key, jnp.inf,
                    (top_keys[:] >> kc.bits).astype(jnp.float32))
            else:
                vals_ref[:] = pltpu.bitcast(top_keys[:], jnp.float32)
            ids_ref[:] = top_ids[:]


def _l2_topk_kernel_rf(q_ref, r_ref, rn_ref, vals_ref, ids_ref,
                       qn, top_keys, top_ids, *unp_scratch, k: int, tn: int,
                       tq: int, in_dtype, pack: int = 1,
                       kc: _Keys = _DEFAULT_KEYS):
    """Refs-outermost order (round 3): the grid is (ref tiles, query
    tiles), so each ref tile streams from HBM ONCE and is reused across
    every query tile — vs the (i, j) order's bp/tq re-streams of the
    whole chromosome-scale matrix (~4x at the bench point).  Query tiles
    stay small (tq=256) because merge cost scales with tile rows
    (measured: tq 256 -> 1024 loses 6+ ms).  Per-query-tile top-k
    state lives in row-sliced scratch ([bp, K], sliced by i); outputs
    are written on the last ref tile, with earlier grid steps' flushes
    parked on block 0 via the index map (no per-j garbage flushes of
    every query block).  Single whole-d tile only (the genotype/token
    path).  Epilogue logic mirrors _l2_topk_kernel exactly.

    ``pack > 1``: refs arrive PLANAR-PACKED — int8 bytes whose bit-planes
    are contiguous original-column blocks (byte column j holds original
    columns {j + m*D8 : m < pack} at bit offset m*(8/pack); see
    pack_planar).  The tile is unpacked ONCE per ref tile (i == 0) into a
    VMEM scratch in the compute dtype and reused by every query tile, so
    HBM streams 1/pack of the unpacked bytes while the MXU sees ordinary
    dense operands.  This is also the int4-compute on-ramp: sub-byte
    arrays cannot cross the jit boundary under this runtime (ROADMAP.md
    dead ends) but an int8->int4 cast INSIDE the kernel is legal."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    nn = pl.num_programs(0)
    rows = pl.ds(i * tq, tq)
    integer = jnp.issubdtype(jnp.dtype(in_dtype), jnp.integer)
    acc_t = jnp.int32 if integer else jnp.float32
    inf_key = kc.int_inf_key if integer else kc.inf_key

    if pack > 1:
        unp = unp_scratch[0]
        bits = 8 // pack
        d8 = r_ref.shape[1]

        @pl.when(i == 0)
        def _():
            # Sign-extension is harmless: plane bits sit below bit 8 and
            # the mask clears everything above them.
            r32 = r_ref[:].astype(jnp.int32)
            for m in range(pack):
                plane = (r32 >> (m * bits)) & ((1 << bits) - 1)
                unp[:, m * d8:(m + 1) * d8] = plane.astype(unp.dtype)

    @pl.when(j == 0)
    def _():
        top_keys[rows, :] = jnp.full((tq, _K_LANES), inf_key, jnp.int32)
        top_ids[rows, :] = jnp.zeros((tq, _K_LANES), jnp.int32)
        qf = q_ref[:].astype(acc_t)
        qn[rows, :] = jnp.sum(qf * qf, axis=1, keepdims=True)

    precision = (jax.lax.Precision.HIGHEST
                 if in_dtype == jnp.float32 else None)
    # Norm-fused single-tile accumulation as a VALUE (no acc scratch):
    # a = 2<q,r> - |r|^2 (queries pre-doubled by the wrapper).
    if pack > 1:
        rmat = unp[:]
        qmat = q_ref[:].astype(unp.dtype) if unp.dtype != q_ref.dtype \
            else q_ref[:]
    else:
        rmat, qmat = r_ref[:], q_ref[:]
    a = jax.lax.dot_general(
        qmat, rmat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t, precision=precision) - rn_ref[:]

    qn_i = qn[rows, :]
    tau = top_keys[rows, k - 1:k]
    if integer:
        thr = (qn_i >> 2) - (tau >> kc.bits)
        gate = jnp.any(a > thr)
    else:
        tau_next = pltpu.bitcast(
            jnp.minimum(tau + (1 << kc.bits), kc.inf_key), jnp.float32)
        thr = 0.25 * qn_i - tau_next
        gate = jnp.any(a > thr)

    @pl.when(gate)
    def _():
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1)
        if integer:
            dist = jnp.clip((qn_i >> 2) - a, 0, kc.int_dist_cap)
            keys = (dist << kc.bits) | lanes
        else:
            dist = jnp.maximum(0.25 * qn_i - a, 0.0)
            keys = (pltpu.bitcast(dist, jnp.int32) & kc.key_mask) | lanes

        m0 = jnp.min(keys, axis=1, keepdims=True)
        li = jax.lax.broadcasted_iota(jnp.int32, (tq, _K_LANES), 1)

        def cond(carry):
            _, m, tau_c = carry
            return jnp.any((m & kc.key_mask) < tau_c)

        def body(carry):
            keys_c, m, _ = carry
            qkey = m & kc.key_mask
            gid = j * tn + (m & kc.id_mask)
            tk = top_keys[rows, :]
            ti = top_ids[rows, :]
            pos = jnp.sum((tk <= qkey).astype(jnp.int32),
                          axis=1, keepdims=True)
            sk = pltpu.roll(tk, 1, axis=1)
            si = pltpu.roll(ti, 1, axis=1)
            top_keys[rows, :] = jnp.where(
                li < pos, tk, jnp.where(li == pos, qkey, sk))
            top_ids[rows, :] = jnp.where(
                li < pos, ti, jnp.where(li == pos, gid, si))
            keys_n = jnp.where(keys_c == m, _MAX_KEY, keys_c)
            m_n = jnp.min(keys_n, axis=1, keepdims=True)
            return keys_n, m_n, top_keys[rows, k - 1:k]

        jax.lax.while_loop(cond, body, (keys, m0, tau))

    @pl.when(j == nn - 1)
    def _():
        tk = top_keys[rows, :]
        if integer:
            vals_ref[:] = jnp.where(tk >= kc.int_inf_key, jnp.inf,
                                    (tk >> kc.bits).astype(jnp.float32))
        else:
            vals_ref[:] = pltpu.bitcast(tk, jnp.float32)
        ids_ref[:] = top_ids[rows, :]


@functools.partial(jax.jit, static_argnames=("k", "tq", "tn", "td",
                                             "order", "interpret", "pack",
                                             "compute"))
def l2_topk_pallas(queries: jax.Array, refs: jax.Array, r_norms: jax.Array,
                   k: int, tq: int = 256, tn: int | None = None,
                   td: int | None = None,
                   order: str = "auto",
                   interpret: bool = False,
                   pack: int = 1,
                   compute=None) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2 with the fused Pallas kernel.

    Args:
      queries: ``[B, d]`` float array (cast to refs' dtype).
      refs: ``[N, d]`` float array (same d).
      r_norms: ``[N]`` f32 squared norms of refs (precomputed; pass +inf for
        rows that must never be retrieved, e.g. padding).
      k: number of neighbours (1 <= k <= 128).
      order: grid order — "qfirst" (query tiles outermost; refs stream
        bp/tq times), "rfirst" (ref tiles outermost; refs stream ONCE,
        top-k state in row-sliced scratch — single-d-tile shapes only),
        or "auto" (rfirst when eligible and the [B, K] state fits VMEM).
      pack: > 1 means ``refs`` is planar-packed int8 (pack_planar): pack
        values per byte, 1/pack the HBM stream, unpacked once per ref
        tile into VMEM.  Queries stay unpacked [B, d].  Implies the
        integer path and rfirst order.
      compute: MXU operand dtype for the packed path (default int8;
        jnp.int4 runs the double-again-rate 4-bit dot on TPU — values
        incl. doubled queries must fit [-8, 7]).

    Returns:
      (dists ``[B, k]`` f32 squared distances quantized to 2048 ULP
      (bit-exact for integer-dtype vectors), ids ``[B, k]`` int32), sorted
      ascending, ties broken by ascending id.
    """
    assert 1 <= k <= _K_LANES, f"k={k} out of range (max {_K_LANES})"
    if tn is None:
        tn = default_tn(refs.dtype)
    b, d = queries.shape
    n, d2 = refs.shape
    if pack == 1:
        assert d == d2 and r_norms.shape == (n,)
    else:
        # Planar-packed refs (pack_planar): [N, D8] int8 bytes carrying
        # ``pack`` bit-planes each; the unpacked width is D8*pack >= d.
        assert refs.dtype == jnp.int8, "packed refs must be int8 bytes"
        assert pack in (2, 4, 8) and r_norms.shape == (n,)
        assert d <= d2 * pack, f"queries d={d} exceed unpacked {d2 * pack}"

    if interpret and refs.dtype == jnp.int4:
        # The CPU interpreter cannot lower sub-byte dots ("custom element
        # sizes on non-sub-byte types"); int8 math is exact for the same
        # values, so interpret-mode tests still cover the int4 wrapper
        # path while the real 4-bit MXU dot is exercised on TPU only.
        refs = refs.astype(jnp.int8)
    integer = pack > 1 or jnp.issubdtype(refs.dtype, jnp.integer)
    if integer:
        # Integer path (genotype/token vectors): distances are exact int32
        # and the MXU runs int8 at double rate (int4 faster still: 296 vs
        # 270 TOPs measured, with half the ref-streaming bytes — the
        # natural storage for binary genotypes).  Key packing needs
        # dist < 2^20, i.e. small element values: |q_i - r_i| <= 16 at
        # d = 4096 (binary genotypes and vocab-sized tokens are inside;
        # the clip to _INT_DIST_CAP keeps overflow safe regardless, at
        # the cost of ordering among capped rows only).  The
        # norm-fused accumulator additionally needs 2*q to fit the
        # storage dtype: |q_i| <= 63 for int8, |q_i| <= 3 for int4 —
        # binary vectors are inside both.
        assert d <= (1 << 12), "int path supports d <= 4096 (key overflow)"
    # Pre-double so the kernel's accumulator lands on 2<q,r> - |r|^2
    # directly (see _l2_topk_kernel).  Cast first (preserving the
    # storage-dtype rounding semantics), then double — exact for floats
    # (exponent bump) and for |q_i| <= 63 ints.
    compute_dt = None
    if pack > 1:
        compute_dt = jnp.dtype(jnp.int8 if compute is None else compute)
        if compute_dt == jnp.int4 and pack == 2:
            raise ValueError(
                "compute=int4 admits values in [-8, 7]: pack=2 planes "
                "reach 15 and doubled queries 30 — use pack >= 4")
        if interpret and compute_dt == jnp.int4:
            compute_dt = jnp.dtype(jnp.int8)  # interpreter: no sub-byte dots
        queries = queries.astype(jnp.int8) * 2
    else:
        queries = queries.astype(refs.dtype) * 2
    if pack > 1:
        # Packed refs are a single byte tile; the unpacked width is one
        # whole d tile (two_d), so the grid has no kd axis.
        r_td = _round_up(max(d2, 128), 128)
        td = r_td * pack
    elif td is None:
        # Wider d tiles amortize the per-tile merge check (measured on v5e
        # at N=664k, d=2040: td 512 -> 2048 is 23.9k -> 28.4k QPS); f32
        # tiles are twice the bytes, so cap them lower for VMEM.
        # default_td is the single source of this rule: ref_alignment()
        # relies on it so build(align=True) pads to the tile picked here.
        td = default_td(d, refs.dtype)
    sub = 32 if integer else 8  # int8 sublane tiling minimum is 32
    tq = min(max(tq, sub), _round_up(max(b, sub), sub))
    tn = min(tn, _round_up(max(n, 128), 128))
    # Widen the key id field when the ref tile needs it (tn=4096 ->
    # 12 bits; integer distances then cap at 2^19 — still far above
    # any genotype/token distance at d <= 4096 with small values).
    id_bits = max(_ID_BITS, (max(tn, 2) - 1).bit_length())
    assert id_bits <= 14, f"tn={tn} exceeds id-bit capacity"
    kc = _DEFAULT_KEYS if id_bits == _ID_BITS else _Keys(id_bits)
    if pack > 1:
        bp, np_, dp = _round_up(b, tq), _round_up(n, tn), td
        qp = jnp.pad(queries, ((0, bp - b), (0, dp - d)))
        rp = jnp.pad(refs, ((0, np_ - n), (0, r_td - d2)))
    else:
        td = r_td = min(td, _round_up(max(d, 128), 128))
        bp, np_, dp = _round_up(b, tq), _round_up(n, tn), _round_up(d, td)
        qp = jnp.pad(queries, ((0, bp - b), (0, dp - d)))
        rp = jnp.pad(refs, ((0, np_ - n), (0, dp - d)))
    # 2D [1, N] layout: 1D f32 operands trip XLA/Mosaic tiling mismatches.
    if integer:
        rn = jnp.where(jnp.isinf(r_norms), kc.int_dist_cap,
                       r_norms).astype(jnp.int32)
        rnp = jnp.pad(rn, (0, np_ - n),
                      constant_values=kc.int_dist_cap)[None, :]
    else:
        rnp = jnp.pad(r_norms.astype(jnp.float32), (0, np_ - n),
                      constant_values=jnp.inf)[None, :]

    two_d = dp == td
    if pack > 1:
        if bp > 4096:
            raise ValueError(
                "packed path needs the rfirst [B,K] state in VMEM: "
                f"batch {b} > 4096 — chunk the queries (FlatL2Index."
                "search does this automatically)")
        order = "rfirst"
    elif order == "auto":
        # rfirst streams the (large) ref matrix once instead of bp/tq
        # times; its [bp, K] top-k state must fit VMEM comfortably.
        order = "rfirst" if two_d and bp <= 4096 else "qfirst"
    assert order in ("qfirst", "rfirst")
    rfirst = order == "rfirst" and two_d
    nn_tiles = np_ // tn
    if rfirst:
        grid = (nn_tiles, bp // tq)
        qmap = lambda j, i: (i, 0)
        rmap = lambda j, i: (j, 0)
        nmap = lambda j, i: (0, j)
        # Outputs are only written on the last ref tile; park every
        # earlier grid step's buffer flush on block 0 so the (i-indexed)
        # output blocks are not garbage-flushed once per (j, i) step.
        omap = lambda j, i: (jnp.where(j == nn_tiles - 1, i, 0), 0)
        kernel = functools.partial(
            _l2_topk_kernel_rf, k=k, tn=tn, tq=tq, pack=pack, kc=kc,
            in_dtype=compute_dt if pack > 1 else refs.dtype)
        scratch = [
            pltpu.VMEM((bp, 1),                       # query norms (per i)
                       jnp.int32 if integer else jnp.float32),
            pltpu.VMEM((bp, _K_LANES), jnp.int32),    # running top-k keys
            pltpu.VMEM((bp, _K_LANES), jnp.int32),    # running top-k ids
        ]
        if pack > 1:
            # Per-ref-tile unpacked planes, written once (i == 0) and
            # reused by every query tile of the same j.
            scratch.append(pltpu.VMEM((tn, td), compute_dt))
    elif two_d:
        # One d tile covers the whole feature dim (the genotype/token
        # path): drop the size-1 kd grid axis — Mosaic pipelines the 2D
        # grid measurably faster (see _l2_topk_kernel).
        grid = (bp // tq, nn_tiles)
        qmap = lambda i, j: (i, 0)
        rmap = lambda i, j: (j, 0)
        nmap = lambda i, j: (0, j)
        omap = lambda i, j: (i, 0)
    else:
        grid = (bp // tq, nn_tiles, dp // td)
        qmap = lambda i, j, kd: (i, kd)
        rmap = lambda i, j, kd: (j, kd)
        nmap = lambda i, j, kd: (0, j)
        omap = lambda i, j, kd: (i, 0)
    if not rfirst:
        kernel = functools.partial(_l2_topk_kernel, k=k, tn=tn, kc=kc,
                                   in_dtype=refs.dtype, two_d=two_d)
        scratch = [
            pltpu.VMEM((tq, tn),                      # dot-product accumulator
                       jnp.int32 if integer else jnp.float32),
            pltpu.VMEM((tq, 1),                       # query norms
                       jnp.int32 if integer else jnp.float32),
            pltpu.VMEM((tq, _K_LANES), jnp.int32),    # running top-k keys
            pltpu.VMEM((tq, _K_LANES), jnp.int32),    # running top-k ids
        ]

    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, td), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, r_td), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), nmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, _K_LANES), omap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, _K_LANES), omap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((bp, _K_LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp,
            # ref stream: packed tiles are r_td bytes wide; the unpacked
            # multi-d-tile path streams the full dp per query-tile pass
            bytes_accessed=4 * (bp * dp
                                + (bp // tq) * np_
                                * (r_td if pack > 1 else dp)
                                + bp * _K_LANES),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rp, rnp)

    return vals[:b, :k], ids[:b, :k]
