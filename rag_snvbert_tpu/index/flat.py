"""Device-resident exact flat indexes: L2 and Hamming.

The TPU-native replacement for the reference's FAISS surface:
  - ``faiss.IndexFlatL2(d)`` + ``.add`` + ``.search``  -> ``FlatL2Index``
    (build_ref_db_l2.py:86-93, test_faiss.py:118-135,
     src/dataset/rag_train_dataset.py:129-137)
  - ``faiss.IndexBinaryFlat`` over np.packbits haplotypes -> ``HammingIndex``
    (test_faiss_intersect.py:164-183)
  - ``faiss.write_index``/``read_index`` -> ``save``/``load`` (npz shards)
  - "GPU transfer" (``index_cpu_to_gpu``, embedding_rag_infer_dataset.py:
    209-224) -> a plain ``jax.device_put``; the index lives in HBM.

"Build" is trivial by design: an exact flat index is just the vector matrix
plus cached squared norms — one ``device_put`` and one reduction, so
chromosome-scale rebuild is bandwidth-bound (BASELINE.md target: < 30 s).

The masked-query mode replaces the reference's rebuild-per-mask pattern
(partial_faiss_intersect.py:82-111): instead of dropping masked columns and
re-adding all vectors to a temporary index, we correct the norms with one
matmul and search the same resident index.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import l2_ref
from ..ops.l2_topk_pallas import (MAX_K, default_tn, l2_topk_pallas,
                                  pack_planar, planar_sq_norms,
                                  planar_unpack, ref_alignment)


def _on_tpu(x: jax.Array) -> bool:
    """True if the array is committed/placed on a TPU device (the Pallas
    kernel path); CPU-resident arrays use the XLA reference path."""
    dev = getattr(x, "device", None)
    if dev is None:
        return jax.default_backend() == "tpu"
    platform = getattr(dev, "platform", None)
    if platform is None:  # Sharding object
        try:
            platform = next(iter(dev.device_set)).platform
        except Exception:
            return jax.default_backend() == "tpu"
    return platform == "tpu"


@struct.dataclass
class FlatL2Index:
    """Exact squared-L2 flat index resident in device memory.

    ``vectors``: [N, d]; ``norms``: [N] f32 squared norms (+inf marks rows
    that must never be retrieved — used for padding and tombstones).

    ``n_real`` / ``d_real`` are set when the storage is tile-aligned
    (``build(..., align=True)``): the arrays are padded to the Pallas
    kernel's tile multiples at build time (padding rows carry +inf norms,
    padding columns are zero) so the search wrapper's per-call ``jnp.pad``
    of the chromosome-scale matrix becomes a no-op — measured 42.7k ->
    48.8k QPS on v5e (a full HBM round trip saved per batch).  ``ntotal``
    / ``d`` keep reporting the logical sizes and padded rows can never be
    retrieved.
    """

    vectors: jax.Array
    norms: jax.Array
    n_real: int | None = struct.field(pytree_node=False, default=None)
    d_real: int | None = struct.field(pytree_node=False, default=None)
    # pack > 1: ``vectors`` is planar-packed int8 (ops/l2_topk_pallas.
    # pack_planar) — pack values per byte, 1/pack the HBM residency and
    # stream; searched by the kernel's in-VMEM unpack path.  d_real is
    # always set.  pack=8 is the binary-genotype mode (the reference's
    # packbits DB, test_faiss_intersect.py:164-183, kept exact-L2).
    pack: int = struct.field(pytree_node=False, default=1)

    @property
    def ntotal(self) -> int:
        return self.n_real if self.n_real is not None else self.vectors.shape[0]

    @property
    def d(self) -> int:
        return self.d_real if self.d_real is not None else self.vectors.shape[1]

    @classmethod
    def build(cls, vectors, dtype=jnp.float32,
              align: bool = False, pack: int = 1) -> "FlatL2Index":
        if pack > 1:
            return cls._build_packed(vectors, pack, align)
        v = jnp.asarray(vectors, dtype=dtype)
        if (jnp.issubdtype(v.dtype, jnp.integer)
                and not isinstance(v, jax.core.Tracer)):
            # The fused kernel pre-doubles queries in the storage dtype
            # (ops/l2_topk_pallas.py), so values must satisfy |v| <= 63
            # (int8) / |v| <= 3 (int4); queries share the vectors' value
            # domain (genotypes/token ids).  One device reduction +
            # scalar fetch, once per build.
            bound = 3 if v.dtype == jnp.int4 else 63
            mx = int(jnp.max(jnp.abs(v.astype(jnp.int32))))
            if mx > bound:
                raise ValueError(
                    f"max |value| {mx} > {bound}: doubling would wrap in "
                    f"{v.dtype} — store as float or a wider int")
        if not align:
            return cls(vectors=v, norms=l2_ref.squared_norms(v))
        n, d = v.shape
        n_mult, dp = ref_alignment(d, dtype)
        np_ = -(-n // n_mult) * n_mult
        v = jnp.pad(v, ((0, np_ - n), (0, dp - d)))
        norms = jnp.where(jnp.arange(np_) < n, l2_ref.squared_norms(v),
                          jnp.inf)
        return cls(vectors=v, norms=norms,
                   n_real=n if np_ != n else None,
                   d_real=d if dp != d else None)

    @classmethod
    def _build_packed(cls, vectors, pack: int, align: bool
                      ) -> "FlatL2Index":
        """Planar-packed storage: pack values per int8 byte (pack=8 for
        binary genotypes, 4 for dosage 0..3, 2 for small ints <= 7)."""
        v = jnp.asarray(vectors)
        if not jnp.issubdtype(v.dtype, jnp.integer):
            raise TypeError(
                f"packed storage needs integer input, got {v.dtype} "
                "(pack_planar would silently floor floats)")
        hi = 1 << (8 // pack)
        if not isinstance(v, jax.core.Tracer):
            # min/max in the source dtype: no int32 upcast of a
            # chromosome-scale matrix
            lo_v, hi_v = int(jnp.min(v)), int(jnp.max(v))
            if lo_v < 0 or hi_v >= hi:
                raise ValueError(
                    f"pack={pack} admits values in [0, {hi}); "
                    f"data spans [{lo_v}, {hi_v}]")
        n, d = v.shape
        packed = pack_planar(v, pack)
        norms = planar_sq_norms(packed, pack)
        if not align:
            return cls(vectors=packed, norms=norms, d_real=d, pack=pack)
        n_mult = default_tn(jnp.int8)
        np_ = -(-n // n_mult) * n_mult
        packed = jnp.pad(packed, ((0, np_ - n), (0, 0)))
        norms = jnp.where(jnp.arange(np_) < n,
                          jnp.pad(norms, (0, np_ - n)), jnp.inf)
        return cls(vectors=packed, norms=norms,
                   n_real=n if np_ != n else None, d_real=d, pack=pack)

    # Above this distance-matrix size the streaming Pallas kernel (which
    # never materializes [B, N]) takes over from the XLA matmul + top_k
    # path.  Round-2 threshold-gated merge measured on v5e at N=664k,
    # d=2040, k=10, batch 1024: kernel = 35.5 ms/batch (28.8k QPS) vs XLA
    # exact = 41.6 ms (24.6k QPS) vs approx_max_k = 17 ms (recall 0.95) —
    # the kernel now wins whenever the workload is big enough to be
    # matmul-bound, so the XLA path is kept only for small searches where
    # its compile latency and tiny-shape overheads win.
    _PALLAS_BYTES = 1 << 28

    def search(self, queries: jax.Array, k: int,
               use_pallas: bool | None = None, approx: bool = False,
               recall_target: float = 0.95, compute=None
               ) -> tuple[jax.Array, jax.Array]:
        """k-NN search -> (squared dists [B,k], ids [B,k]), ascending.

        ``use_pallas=None`` auto-selects by workload: the XLA matmul +
        exact top_k when the [B, N] distance matrix is affordable, the
        streaming Pallas kernel when it is not (or off-TPU never).
        ``approx=True`` uses the TPU's hardware PartialReduce
        (lax.approx_max_k) — ~2.5x the exact throughput at set-recall
        ~0.95; the returned distances are exact for the returned ids.
        On packed storage the flag is a no-op: the exact int4-MXU path
        is already faster than approx on unpacked storage, so approx
        is dominated and the caller simply gets exact results.
        ``compute`` (packed storage only) picks the MXU operand dtype:
        default int4 for pack >= 4 — the 4-bit dot measured 90.1k QPS
        exact on the chr21-scale index vs 69.5k for int8 compute
        (tools/sweep_topk, v5e).  Exact whenever doubled query values
        fit [-8, 7], which build()'s range guard already ensures for
        the stored planes (pack=8 values are 0/1, pack=4 are 0..3) and
        integer-valued queries in the same range satisfy; pass
        ``compute=jnp.int8`` for query values up to 63.
        """
        if self.pack > 1:
            # approx=True is satisfied by the exact packed path: on this
            # workload the int4-MXU exact kernel (91.4k QPS, BENCH_r03)
            # already beats approx_max_k on unpacked bf16 (64.9k), so the
            # recall<1 mode is strictly dominated for packed storage —
            # the caller gets >= the recall they asked for, faster.
            if compute is None and self.pack >= 4:
                compute = jnp.int4
            q = jnp.asarray(queries)
            if k > MAX_K:
                # Kernel top-k state is 128 lanes; arbitrary k (FAISS
                # parity: IndexFlatL2.search takes any k — the reference
                # calls it with caller-chosen top_k, test_faiss.py:135's
                # index.search(batch_data_1d, args.top_k) — so no cap is
                # acceptable here)
                # streams per-chunk unpack + merge — never materializes
                # the unpacked matrix.
                return l2_ref.l2_topk_streaming(
                    q[:, : self.d], self.vectors, k, r_norms=self.norms,
                    unpack=lambda c: planar_unpack(c, self.pack, self.d))
            if use_pallas is False or not _on_tpu(self.vectors):
                # Off-TPU (or an explicit cross-check request): unpack via
                # XLA and run the reference matmul+topk path — the same
                # fallback every other storage dtype gets.
                return self._search_unpacked_fallback(q, self.norms, k)
            if q.shape[0] > 4096:  # rfirst [B, K] state must fit VMEM
                parts = [self.search(q[s:s + 4096], k, compute=compute)
                         for s in range(0, q.shape[0], 4096)]
                return (jnp.concatenate([p[0] for p in parts]),
                        jnp.concatenate([p[1] for p in parts]))
            return l2_topk_pallas(q, self.vectors, self.norms, k,
                                  pack=self.pack, compute=compute)
        q = jnp.asarray(queries, dtype=self.vectors.dtype)
        if q.shape[1] != self.vectors.shape[1]:  # aligned storage: pad the
            # (small) query block to the stored width; zero columns add 0
            # to every distance term.
            q = jnp.pad(q, ((0, 0), (0, self.vectors.shape[1] - q.shape[1])))
        if approx:
            qf = q.astype(jnp.float32)
            dots = jnp.dot(qf, self.vectors.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            # |q|^2 is constant per row: rank-safe to drop in the search,
            # added back for the returned distances.
            part = self.norms[None, :] - 2.0 * dots
            negv, ids = jax.lax.approx_max_k(-part, k,
                                             recall_target=recall_target)
            q_norms = jnp.sum(qf * qf, axis=-1, keepdims=True)
            return jnp.maximum(-negv + q_norms, 0.0), ids
        if k > MAX_K:  # above the kernel's lane cap: bounded-memory scan
            return l2_ref.l2_topk_streaming(q, self.vectors, k,
                                            r_norms=self.norms)
        if use_pallas is None:
            b = q.shape[0]
            use_pallas = (_on_tpu(self.vectors)
                          and 4 * b * self.ntotal > self._PALLAS_BYTES)
        if use_pallas:
            return l2_topk_pallas(q, self.vectors, self.norms, k)
        d = l2_ref.l2_distances(q, self.vectors, r_norms=self.norms)
        return l2_ref.topk_smallest(d, k)

    def _search_unpacked_fallback(self, q: jax.Array, norms: jax.Array,
                                  k: int, packed: jax.Array | None = None
                                  ) -> tuple[jax.Array, jax.Array]:
        """XLA reference path for packed storage: unpack planes and run
        the matmul + top_k oracle (off-TPU and use_pallas=False)."""
        v = planar_unpack(self.vectors if packed is None else packed,
                          self.pack, self.d)
        qf = q[:, : self.d].astype(jnp.float32)
        d = l2_ref.l2_distances(qf, v.astype(jnp.float32), r_norms=norms)
        return l2_ref.topk_smallest(d, k)

    def masked_search(self, queries: jax.Array, dim_mask: jax.Array, k: int,
                      use_pallas: bool | None = None, compute=None
                      ) -> tuple[jax.Array, jax.Array]:
        """Exact k-NN over the unmasked subset of dimensions.

        ``dim_mask``: [d] with 1 = dimension participates.  Equivalent to
        the reference's drop-masked-columns + temporary index
        (partial_faiss_intersect.py:82-111) without any rebuild: queries are
        masked elementwise and reference norms are corrected by the matmul
        ``(R*R) @ m``; the resident index is searched as-is (masked query
        dims contribute q_i = 0 and the corrected norms remove r_i^2 terms).
        """
        if self.pack > 1:
            # Masking in the packed domain: AND with the planar-packed
            # mask zeroes masked values in place (1/pack the bytes of the
            # unpacked masked-copy the float path would make); masked
            # norms come from one fused unpack-reduce pass.
            bits = 8 // self.pack
            m = jnp.asarray(dim_mask).astype(jnp.int32)
            pm = pack_planar((m * ((1 << bits) - 1))[None, :], self.pack)[0]
            rm = self.vectors & pm[None, :]
            masked_norms = planar_sq_norms(rm, self.pack)
            masked_norms = jnp.where(jnp.isinf(self.norms), jnp.inf,
                                     masked_norms)
            qm = jnp.asarray(queries) * m[None, : queries.shape[1]]
            if k > MAX_K:  # arbitrary-k: same streaming route as search()
                return l2_ref.l2_topk_streaming(
                    qm[:, : self.d], rm, k, r_norms=masked_norms,
                    unpack=lambda c: planar_unpack(c, self.pack, self.d))
            if use_pallas is False or not _on_tpu(self.vectors):
                return self._search_unpacked_fallback(qm, masked_norms, k,
                                                      packed=rm)
            if compute is None and self.pack >= 4:
                compute = jnp.int4  # same contract as search()
            return l2_topk_pallas(qm, rm, masked_norms, k, pack=self.pack,
                                  compute=compute)
        m = dim_mask.astype(self.vectors.dtype)
        qm = jnp.asarray(queries, dtype=self.vectors.dtype) * m[None, :]
        if qm.shape[1] != self.vectors.shape[1]:  # aligned storage
            pad_d = self.vectors.shape[1] - qm.shape[1]
            qm = jnp.pad(qm, ((0, 0), (0, pad_d)))
            m = jnp.pad(m, (0, pad_d))
        rf = self.vectors.astype(jnp.float32)
        masked_norms = jnp.dot(rf * rf, m.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
        # Preserve tombstones: +inf rows stay +inf under the mask.
        masked_norms = jnp.where(jnp.isinf(self.norms), jnp.inf, masked_norms)
        if k > MAX_K:  # above the kernel's lane cap: bounded-memory scan
            return l2_ref.l2_topk_streaming(qm, self.vectors, k,
                                            r_norms=masked_norms)
        if use_pallas is None:  # same size routing as search()
            b = qm.shape[0]
            use_pallas = (_on_tpu(self.vectors)
                          and 4 * b * self.ntotal > self._PALLAS_BYTES)
        if use_pallas:
            return l2_topk_pallas(qm, self.vectors, masked_norms, k)
        d = l2_ref.l2_distances(qm, self.vectors, r_norms=masked_norms)
        return l2_ref.topk_smallest(d, k)

    # ---- persistence (replaces faiss.write_index / read_index) ----

    def save(self, path: str) -> None:
        v = self.vectors
        dtype_name = str(v.dtype)
        if v.dtype == jnp.bfloat16:  # npz has no bf16; store f32 + tag
            v = v.astype(jnp.float32)
        elif v.dtype == jnp.int4:    # npz has no int4; store int8 + tag
            v = v.astype(jnp.int8)
        np.savez(path, vectors=np.asarray(v), norms=np.asarray(self.norms),
                 dtype=np.asarray(dtype_name),
                 n_real=np.asarray(-1 if self.n_real is None else self.n_real),
                 d_real=np.asarray(-1 if self.d_real is None else self.d_real),
                 pack=np.asarray(self.pack))

    @classmethod
    def load(cls, path: str, device=None) -> "FlatL2Index":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        v = jax.device_put(z["vectors"], device)
        if "dtype" in z and str(z["dtype"]) == "bfloat16":
            v = v.astype(jnp.bfloat16)
        elif "dtype" in z and str(z["dtype"]) == "int4":
            v = v.astype(jnp.int4)
        n = jax.device_put(z["norms"], device)

        def real(key):
            if key not in z:  # pre-round-3 files: never aligned
                return None
            val = int(z[key])
            return None if val < 0 else val

        return cls(vectors=v, norms=n, n_real=real("n_real"),
                   d_real=real("d_real"),
                   pack=int(z["pack"]) if "pack" in z else 1)


@struct.dataclass
class HammingIndex:
    """Exact Hamming-distance flat index over bit-packed haplotypes.

    Stores uint32 words (LSB-first packing, ops/l2_ref.pack_bits); distance
    is XOR + popcount on the VPU.  Replaces faiss.IndexBinaryFlat
    (test_faiss_intersect.py:164-183).
    """

    packed: jax.Array   # [N, ceil(d/32)] uint32
    valid: jax.Array    # [N] bool — False rows never retrieved

    @property
    def ntotal(self) -> int:
        return self.packed.shape[0]

    @classmethod
    def build(cls, bits) -> "HammingIndex":
        """``bits``: [N, d] 0/1 array (unpacked).  Host (numpy) inputs
        are packed on the host: the device pack expands to a [N, d_pad]
        uint32 intermediate (~5.4 GB at chromosome scale) that OOMs HBM
        for a 170 MB result."""
        if isinstance(bits, np.ndarray):
            packed = jnp.asarray(l2_ref.pack_bits_np(bits))
        else:
            packed = l2_ref.pack_bits(jnp.asarray(bits))
        return cls(packed=packed,
                   valid=jnp.ones(packed.shape[0], dtype=bool))

    # Above this [B, N, words] XOR-tensor size the streaming scan takes
    # over (exact, bounded memory — chromosome-scale panels would need
    # hundreds of GB on the direct path).
    _STREAM_BYTES = 1 << 30

    def search(self, query_bits: jax.Array, k: int,
               streaming: bool | None = None, chunk: int = 8192
               ) -> tuple[jax.Array, jax.Array]:
        qp = l2_ref.pack_bits(jnp.asarray(query_bits))
        if streaming is None:
            streaming = (4 * qp.shape[0] * self.packed.shape[0]
                         * self.packed.shape[1] > self._STREAM_BYTES)
        if streaming:
            return l2_ref.hamming_topk_streaming(qp, self.packed, k,
                                                 valid=self.valid,
                                                 chunk=chunk)
        d = l2_ref.hamming_distances(qp, self.packed)
        d = jnp.where(self.valid[None, :], d, jnp.iinfo(jnp.int32).max)
        return l2_ref.topk_smallest(d, k)

    def save(self, path: str) -> None:
        np.savez(path, packed=np.asarray(self.packed),
                 valid=np.asarray(self.valid))

    @classmethod
    def load(cls, path: str, device=None) -> "HammingIndex":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        return cls(packed=jax.device_put(z["packed"], device),
                   valid=jax.device_put(z["valid"], device))
