"""Window-major imputation inference: masked-site prediction, scatter-back,
NPY/VCF emission, and progressive (iterative) refinement.

Reference parity:
  - InferDataset: fixed-stride windows over the reference-panel site list;
    the mask marks sites absent from the target VCF (``position_needed``,
    src/dataset/dataset.py:629-931); scatter-back into [n_sites, n_samples]
    probability matrices (src/main/infer.py:128-232).
  - V18 inference entry (src/infer_embedding_rag.py:32-257): window-major
    order for retrieval-context locality, no-grad retrieval, hap probs ->
    p00/p01/p10/p11, [W,S,L] -> [W*L,S] geometry with SOS/pad strip, real
    CHROM/REF/ALT metadata from the source VCF.
  - save_npy_result HAP1/HAP2/GT/POS/POS_Flag (src/main/infer.py:435-452).
  - ProgressiveInferController (src/main/infer.py:24-71, 345-433): impute,
    keep the most confident fraction as known, rebuild queries, repeat.

TPU-native notes: batches are window-major with static shapes; the
retrieval context per window reuses train/retrieval.encode_window_refs (the
on-disk FAISS index of the reference is unnecessary — rebuilding the
embedding context is a single fused forward, and persistence is available
via index.flat.FlatL2Index.save for offline workflows).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..data.tokenize import position_normalize, sequence_padding, tokenize
from ..io.freq import AF, FreqTable
from ..io.vcf import VCFData, write_imputed_vcf
from ..io.vocab import INFER_WINDOW_LEN, MAX_SEQ_LEN
from ..train.retrieval import (TokenWindowContext, WindowRefContext,
                               build_token_window_ctx, encode_window_refs,
                               retrieve, retrieve_tokens)


@dataclasses.dataclass
class ImputationResult:
    """[n_sites, n_samples] probability matrices + site metadata."""

    hap1_prob: np.ndarray   # P(allele==1) haplotype 1
    hap2_prob: np.ndarray
    gt_prob: np.ndarray     # [n_sites, n_samples, 4]
    pos: np.ndarray
    imputed_flag: np.ndarray  # True where the site was missing in the target

    def save_npy(self, prefix: str) -> None:
        np.save(prefix + ".HAP1.npy", self.hap1_prob)
        np.save(prefix + ".HAP2.npy", self.hap2_prob)
        np.save(prefix + ".GT.npy", self.gt_prob)
        np.save(prefix + ".POS.npy", self.pos)
        np.save(prefix + ".POS_Flag.npy", self.imputed_flag)

    def write_vcf(self, path: str, ref_vcf: VCFData,
                  sample_names: list[str]) -> None:
        write_imputed_vcf(path, ref_vcf.chrom, self.pos, ref_vcf.ref,
                          ref_vcf.alt, sample_names, self.hap1_prob,
                          self.hap2_prob, imputed_flag=self.imputed_flag)


class Imputer:
    """Impute target samples onto the reference panel's site list."""

    def __init__(self, model, embed_fn: Callable, params: Any,
                 ref_vcf: VCFData, freq: FreqTable,
                 window_len: int = INFER_WINDOW_LEN,
                 seq_len: int = MAX_SEQ_LEN, rag_k: int = 1,
                 ref_pad_haps: int = 2048, batch_size: int = 32,
                 use_pallas: bool | None = None, window=None,
                 rag_mode: str = "embedding", index_dir: str | None = None,
                 mesh=None, pipeline_depth: int = 8):
        """``rag_mode``: "embedding" (V18, embedding-space retrieval),
        "token" (V17, raw-token-space retrieval — the model must be a
        BERTWithRAG that re-encodes rag_seg_h{1,2}; reference
        src/dataset/rag_infer_dataset.py:20-390), or "none" (plain BERT).

        ``index_dir``: load persisted per-window embedding indexes written
        by ``save_window_indexes`` instead of re-encoding refs per window
        (the reference's on-disk FAISS index load,
        embedding_rag_infer_dataset.py:209-224).  The persisted masks must
        match this target (same ``position_needed`` pattern).

        ``mesh``: optional jax.sharding.Mesh for data-parallel serving —
        query batches shard over the ``data`` axis (one forward spans all
        chips; params + window context replicated).  ``batch_size`` must
        be a multiple of the data-axis size.  The reference's serving
        story is one GPU per process; scale-out here is one resident
        model over the whole mesh."""
        assert rag_mode in ("embedding", "token", "none"), rag_mode
        self.rag_mode = rag_mode
        self.index_dir = index_dir
        if index_dir is not None:
            assert rag_mode == "embedding", (
                "persisted indexes exist only for embedding-space RAG "
                "(token-space indexes are trivially rebuilt from tokens)")
        self.model = model
        self.embed_fn = embed_fn
        self.params = params
        self.ref_vcf = ref_vcf
        self.freq = freq
        self.window_len = window_len
        self.seq_len = seq_len
        self.rag_k = rag_k
        self.ref_pad_haps = ref_pad_haps
        self.batch_size = batch_size
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

            assert batch_size % mesh.shape[DATA_AXIS] == 0, (
                "batch_size must divide evenly over the mesh data axis")
            self._data_sh = NamedSharding(mesh, P(DATA_AXIS))
            self._repl = NamedSharding(mesh, P())
            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                # serving under tensor parallelism: place the params with
                # the Megatron shardings (parallel/tp.py) so the forward
                # runs dp x tp — same placement rules as training.
                from ..parallel.tp import shard_tree

                self.params = shard_tree(params, mesh)
            else:
                self.params = jax.device_put(params, self._repl)
        # One jit wrapper for the imputer's lifetime: re-wrapping per
        # impute() call would retrace every request/progressive round.
        self._fwd = jax.jit(self._forward)
        if use_pallas is None:
            if mesh is not None:
                platform = next(iter(mesh.devices.flat)).platform
            else:
                leaf = jax.tree.leaves(params)[0]
                platform = getattr(getattr(leaf, "device", None),
                                   "platform", None)
            use_pallas = platform == "tpu"
        self.use_pallas = use_pallas
        n = ref_vcf.n_variants
        if window is not None:
            # Window-file driven inference (the reference's
            # rag_infer_dataset_window_file.py variant): honor an explicit
            # window table instead of fixed-stride chunking.
            self.windows = [(int(s), int(min(e, n)))
                            for s, e in window.window_info]
        else:
            starts = np.arange(0, n, window_len)
            self.windows = [(int(s), int(min(s + window_len, n)))
                            for s in starts]

    # ---- per-window pieces ----

    def _window_ctx(self, w: int, s: int, e: int, site_mask: np.ndarray
                    ) -> WindowRefContext | TokenWindowContext | None:
        if self.rag_mode == "none":
            return None
        raw = self.ref_vcf.gt[s:e]                    # [n, S, 2]
        raw = raw.reshape(raw.shape[0], -1).T          # [2S, n]
        toks = tokenize(raw, None, self.seq_len).astype(np.int32)
        n_haps = toks.shape[0]
        if self.ref_pad_haps > n_haps:
            toks = np.concatenate([toks, np.zeros(
                (self.ref_pad_haps - n_haps, self.seq_len), np.int32)])
        valid = np.zeros(toks.shape[0], bool)
        valid[:n_haps] = True
        af = sequence_padding(self.freq.lookup(
            AF, self.freq.global_idx, self.ref_vcf.pos[s:e]), self.seq_len)
        wmask = sequence_padding(site_mask.astype(np.int32), self.seq_len)
        if self.rag_mode == "token":
            # V17 token-space context: index over masked raw token vectors
            # (rag_infer_dataset.py:20-390); no encoder pass needed.
            return build_token_window_ctx(jnp.asarray(toks),
                                          jnp.asarray(wmask),
                                          valid=jnp.asarray(valid))
        if self.index_dir is not None:
            # Load the persisted embedding index (the reference's
            # faiss.read_index + index_cpu_to_gpu one-slot cache,
            # embedding_rag_infer_dataset.py:209-224 — here one device_put).
            import os

            from ..index.flat import FlatL2Index

            idx = FlatL2Index.load(os.path.join(self.index_dir,
                                                f"index_{w}"))
            n = idx.vectors.shape[0]
            emb = idx.vectors.reshape(n, self.seq_len, -1)
            return WindowRefContext(ref_emb_search=emb,
                                    ref_tokens=jnp.asarray(toks),
                                    ref_af=jnp.asarray(af),
                                    ref_norms=idx.norms)
        return encode_window_refs(self.embed_fn, self.params,
                                  jnp.asarray(toks), jnp.asarray(af),
                                  jnp.asarray(wmask),
                                  valid=jnp.asarray(valid))

    @staticmethod
    def _sorted_target(target: VCFData) -> VCFData:
        """Normalize an untrusted serving target to sorted positions.

        Every present/missing computation below uses searchsorted, which
        silently mis-marks sites on an unsorted target — normalize once
        at each public entry point (impute, save_window_indexes)."""
        if len(target.pos) and np.any(np.diff(target.pos) < 0):
            order = np.argsort(target.pos, kind="stable")
            target = dataclasses.replace(
                target, pos=target.pos[order], gt=target.gt[order],
                chrom=target.chrom[order], ref=target.ref[order],
                alt=target.alt[order], ids=target.ids[order])
        return target

    def save_window_indexes(self, out_dir: str, target: VCFData) -> dict:
        """Persist per-window embedding-space indexes to disk.

        Offline parity with the reference's
        ``maf_data/faiss_indexes_{name}/index_{w}.faiss``
        (embedding_rag_infer_dataset.py:164-181): each window's masked-ref
        embedding matrix becomes a FlatL2Index .npz shard that
        ``FlatL2Index.load`` can place straight into HBM.  Rebuilding from
        weights is a single fused forward (~tens of ms), so this exists for
        workflows that want weight-independent artifacts, not as a speed
        requirement.
        """
        import os

        from ..index.flat import FlatL2Index

        os.makedirs(out_dir, exist_ok=True)
        target = self._sorted_target(target)
        found = np.searchsorted(target.pos, self.ref_vcf.pos)
        found = np.clip(found, 0, max(len(target.pos) - 1, 0))
        present = (target.pos[found] == self.ref_vcf.pos) \
            if len(target.pos) else np.zeros(self.ref_vcf.n_variants, bool)
        assert self.rag_mode == "embedding", "indexes are embedding-space"
        assert self.index_dir is None, (
            "this Imputer loads persisted indexes; build the artifacts "
            "with an Imputer constructed without index_dir")
        manifest = {"windows": len(self.windows), "d": None,
                    "seq_len": self.seq_len}
        for w, (s, e) in enumerate(self.windows):
            ctx = self._window_ctx(w, s, e, ~present[s:e])
            n = ctx.ref_emb_search.shape[0]
            vectors = ctx.ref_emb_search.reshape(n, -1)
            idx = FlatL2Index(vectors=vectors, norms=ctx.ref_norms)
            idx.save(os.path.join(out_dir, f"index_{w}"))
            manifest["d"] = int(vectors.shape[1])
        import json as _json

        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            _json.dump(manifest, f)
        return manifest

    # Per-site features (and the mask) are constant across samples within a
    # window: impute() ships them to the device once per window as [L] rows
    # and _forward broadcasts on device — per-batch host->device traffic is
    # then just the two hap token arrays (~4.5x fewer bytes per batch).
    # Measured throughput-neutral on the remote-attached chip (the pipeline
    # already hides transfers; steady state is forward-compute-bound) — the
    # win is host-CPU/link headroom for multi-tenant serving.
    _WINDOW_CONST = ("mask", "pos", "af", "af_p", "ref", "het", "hom")

    def _forward(self, batch: dict, ctx):
        b = batch["hap_1"].shape[0]
        batch = {k: (jnp.broadcast_to(v[None, :], (b, v.shape[0]))
                     if k in self._WINDOW_CONST and v.ndim == 1 else v)
                 for k, v in batch.items()}
        if isinstance(ctx, TokenWindowContext):
            x = retrieve_tokens(batch, ctx, self.rag_k, self.use_pallas)
        elif ctx is None:
            x = batch
        else:
            x = retrieve(self.embed_fn, self.params, batch, ctx, self.rag_k,
                         self.use_pallas, deterministic=True)
        out = self.model.apply({"params": self.params}, x,
                               deterministic=True)
        p1 = jax.nn.softmax(out[0], axis=-1)[..., 1]
        p2 = jax.nn.softmax(out[1], axis=-1)[..., 1]
        pgt = jax.nn.softmax(out[2], axis=-1)
        return p1, p2, pgt

    def impute(self, target: VCFData, pop: int | None = None
               ) -> ImputationResult:
        """Impute all target samples over the whole reference site list.

        ``pop``: population class for the af_p/ref/het/hom features
        (defaults to the global pool, matching inference without panel
        info)."""
        target = self._sorted_target(target)
        fwd = self._fwd
        n_sites = self.ref_vcf.n_variants
        n_samp = target.n_samples
        hap1 = np.zeros((n_sites, n_samp), np.float32)
        hap2 = np.zeros((n_sites, n_samp), np.float32)
        gtp = np.zeros((n_sites, n_samp, 4), np.float32)

        # position_needed: ref-panel sites missing from the target VCF
        found = np.searchsorted(target.pos, self.ref_vcf.pos)
        found = np.clip(found, 0, max(len(target.pos) - 1, 0))
        present = (target.pos[found] == self.ref_vcf.pos) if len(target.pos) \
            else np.zeros(n_sites, bool)
        target_rows = found  # valid where present

        pop_idx = self.freq.global_idx if pop is None else pop
        L = self.seq_len
        bs = self.batch_size

        def make_ctx(w):
            s, e = self.windows[w]
            ctx = self._window_ctx(w, s, e, ~present[s:e])
            if self.mesh is not None and ctx is not None:
                ctx = jax.device_put(ctx, self._repl)
            return ctx

        def assemble(w):
            """Host-side query assembly for one window (pure numpy):
            known alleles where present, 0 elsewhere."""
            s, e = self.windows[w]
            miss = ~present[s:e]                      # mask = absent sites
            if len(target.pos):
                rows = np.minimum(target_rows[s:e], len(target.pos) - 1)
                g1, g2 = target.gt[rows, :, 0], target.gt[rows, :, 1]
            else:
                # Degenerate serving input: a target VCF with zero
                # variants (every site imputed from scratch).  The gather
                # above would fancy-index -1 into a 0-row array; here the
                # known-allele fields are simply all-absent.
                g1 = g2 = np.zeros((e - s, n_samp), np.int8)
            h1 = np.where(present[s:e][:, None], g1, 0).T.astype(np.int8)
            h2 = np.where(present[s:e][:, None], g2, 0).T.astype(np.int8)
            mask_p = sequence_padding(miss.astype(np.int32), L)
            toks1 = tokenize(h1, mask_p, L).astype(np.int32)
            toks2 = tokenize(h2, mask_p, L).astype(np.int32)
            positions = self.ref_vcf.pos[s:e]
            feats = self.freq.window_features(positions, pop_idx)
            row = {k: sequence_padding(v, L) for k, v in feats.items()}
            pos_n = sequence_padding(position_normalize(positions), L)
            af_g = sequence_padding(self.freq.lookup(
                AF, self.freq.global_idx, positions), L)
            return toks1, toks2, mask_p, row, pos_n, af_g

        # One-window ctx lookahead + threaded query assembly: the NEXT
        # window's (jitted, async) reference encode is dispatched before
        # this window's forwards are fetched (the refresh rides behind
        # them on device — serving-side prefetch_ctx), while a daemon
        # thread assembles the next window's numpy queries.
        from ..data.prefetch import prefetch_iter

        assembled = prefetch_iter(
            (assemble(w) for w in range(len(self.windows))), size=1)
        next_ctx = make_ctx(0) if self.windows else None
        for w, (s, e) in enumerate(self.windows):
            n = e - s
            ctx = next_ctx
            toks1, toks2, mask_p, row, pos_n, af_g = next(assembled)
            # Window-constant [L] rows go to the device ONCE per window;
            # _forward broadcasts them to [bs, L] on device.
            const = {"mask": mask_p, "pos": pos_n, "af": af_g,
                     "af_p": row["af_p"], "ref": row["ref"],
                     "het": row["het"], "hom": row["hom"]}
            if self.mesh is not None:
                const = {k: jax.device_put(np.ascontiguousarray(v),
                                           self._repl)
                         for k, v in const.items()}
            else:
                const = {k: jnp.asarray(v) for k, v in const.items()}

            def scatter(b0, b1, nb, out):
                p1, p2, pg = out
                # strip SOS slot and padding: body = sites s..e at 1..n
                p1 = np.asarray(p1)[:nb, 1 : 1 + n]
                p2 = np.asarray(p2)[:nb, 1 : 1 + n]
                pg = np.asarray(pg)[:nb, 1 : 1 + n]
                hap1[s:e, b0:b1] = p1.T
                hap2[s:e, b0:b1] = p2.T
                gtp[s:e, b0:b1] = pg.transpose(1, 0, 2)

            # (b0, b1, nb, device outputs) — fetched a few batches behind
            # the dispatch stream.  The depth bound caps device-resident
            # outputs at O(depth * bs * L * 24B) instead of a whole
            # window's worth (biobank-scale cohorts would otherwise OOM
            # HBM); draining the oldest entry syncs only on work that is
            # several dispatches deep in the async stream.
            pending = []
            for b0 in range(0, n_samp, bs):
                b1 = min(b0 + bs, n_samp)
                nb = b1 - b0
                pad = bs - nb
                def pad_rows(x):
                    return np.concatenate([x, np.repeat(x[:1], pad, 0)]) \
                        if pad else x
                haps = {"hap_1": pad_rows(toks1[b0:b1]),
                        "hap_2": pad_rows(toks2[b0:b1])}
                if self.mesh is not None:
                    # data-parallel serving: batch rows spread over the
                    # mesh, one forward spans all chips
                    haps = {k: jax.device_put(np.ascontiguousarray(v),
                                              self._data_sh)
                            for k, v in haps.items()}
                else:
                    haps = {k: jnp.asarray(v) for k, v in haps.items()}
                pending.append((b0, b1, nb, fwd({**haps, **const}, ctx)))
                if len(pending) > self.pipeline_depth:
                    scatter(*pending.pop(0))
            # All of this window's forwards are dispatched; queue the
            # NEXT window's encode behind them, then fetch — the encode
            # runs on device while the host scatters results back.
            if w + 1 < len(self.windows):
                next_ctx = make_ctx(w + 1)
            for item in pending:
                scatter(*item)

        # Known sites keep their observed alleles (probability 0/1); the
        # genotype matrix follows so every emitted artifact (VCF GP is
        # recomputed from hap probs, .GT.npy is gt_prob) agrees at
        # observed sites.
        known = present
        if len(target.pos):  # empty target: nothing known, all imputed
            kr = np.minimum(target_rows, len(target.pos) - 1)
            obs1 = target.gt[kr, :, 0].astype(np.float32)
            obs2 = target.gt[kr, :, 1].astype(np.float32)
            hap1[known] = obs1[known]
            hap2[known] = obs2[known]
            o1, o2 = obs1[known], obs2[known]
            # class order (h1<<1)+h2: p00, p01, p10, p11
            gtp[known] = np.stack([(1 - o1) * (1 - o2), (1 - o1) * o2,
                                   o1 * (1 - o2), o1 * o2], axis=-1)
        return ImputationResult(hap1_prob=hap1, hap2_prob=hap2, gt_prob=gtp,
                                pos=self.ref_vcf.pos.copy(),
                                imputed_flag=~present)

    def impute_progressive(self, target: VCFData, rounds: int = 3,
                           fill_fraction: float = 0.5) -> ImputationResult:
        """Iterative refinement (ProgressiveInferController semantics):
        each round imputes, then the most confident ``fill_fraction`` of
        still-missing sites become observed input for the next round."""
        work = dataclasses.replace(
            target, gt=target.gt.copy(), pos=target.pos.copy(),
            chrom=target.chrom, ref=target.ref, alt=target.alt,
            ids=target.ids, samples=target.samples)
        result = None
        originally_missing = None
        for r in range(rounds):
            result = self.impute(work)
            if originally_missing is None:
                originally_missing = result.imputed_flag.copy()
            missing = result.imputed_flag
            if not missing.any() or r == rounds - 1:
                break
            # confidence = max distance from 0.5 across both haps (per site)
            conf = (np.abs(result.hap1_prob - 0.5)
                    + np.abs(result.hap2_prob - 0.5)).mean(axis=1)
            miss_idx = np.flatnonzero(missing)
            order = miss_idx[np.argsort(-conf[miss_idx])]
            fill = order[: max(1, int(len(order) * fill_fraction))]
            # promote filled sites into the working target VCF
            new_rows = []
            calls1 = (result.hap1_prob[fill] >= 0.5).astype(np.int8)
            calls2 = (result.hap2_prob[fill] >= 0.5).astype(np.int8)
            gt_new = np.stack([calls1, calls2], axis=-1)  # [F, S, 2]
            merged_pos = np.concatenate([work.pos, self.ref_vcf.pos[fill]])
            merged_gt = np.concatenate([work.gt, gt_new], axis=0)
            order2 = np.argsort(merged_pos, kind="stable")
            work = dataclasses.replace(work, pos=merged_pos[order2],
                                       gt=merged_gt[order2])
        result.imputed_flag = originally_missing
        return result
