"""BERT encoders: plain, token-space RAG (V17), embedding-space RAG (V18).

Reference parity: src/model/bert.py:12-218.  Inputs are a flat dict of
arrays (fixed shapes, XLA-friendly):
  hap_1, hap_2        [B, L] int  masked token sequences
  pos, af, af_p       [B, L] float
  rag_seg_h1/h2       [B, K, L] int      (V17 token-space RAG)
  rag_emb_h1/h2       [B, K, L, D] float (V18 embedding-space RAG)

Returns (h1, h2, h1_origin, h2_origin) like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .embeddings import BERTEmbedding
from .fusion import EmbeddingFusionModule, EnhancedRareVariantFusion
from .transformer import Encoder


class BERT(nn.Module):
    """Dual-haplotype encoder: shared embedding + fusion + N blocks per hap
    (src/model/bert.py:12-76)."""

    vocab_size: int
    dims: int = 512
    n_layers: int = 12
    attn_heads: int = 16
    dropout: float = 0.1
    pre_ln: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32   # compute dtype (bf16 for TPU speed)
    attn_dropout: float | None = None
    scan_layers: bool = False        # lax.scan over encoder layers
    flash_attention: bool | str = False  # fused Pallas attention kernel
    score_dtype: jnp.dtype = jnp.float32
    dropout_broadcast: bool = False  # sequence-shared residual-dropout masks
    fused_qkv: bool = False          # one [D,3D] QKV projection
    int8_matmuls: bool = False       # int8 fwd+bwd encoder matmuls (ops/quant)
    pos_norm: str = "group"          # PositionFeatModule norm; converted
    # torch checkpoints use "frozen_batch" (see interop/torch_ckpt.py)

    def setup(self):
        self.embedding = BERTEmbedding(self.vocab_size, self.dims,
                                       self.dropout, dtype=self.dtype)
        self.emb_fusion = EmbeddingFusionModule(self.dims,
                                                pos_norm=self.pos_norm,
                                                dtype=self.dtype)
        self.encoder = Encoder(self.n_layers, self.dims, self.attn_heads,
                               self.dropout, self.pre_ln, self.remat,
                               dtype=self.dtype,
                               attn_dropout=self.attn_dropout,
                               flash=self.flash_attention,
                               score_dtype=self.score_dtype,
                               scan=self.scan_layers,
                               dropout_broadcast=self.dropout_broadcast,
                               fused_qkv=self.fused_qkv,
                               quant=self.int8_matmuls)

    def embed(self, tokens, af, deterministic=True):
        """Embedding-layer forward — the retrieval encoder. Exposed so the
        in-training retrieval hook can run it standalone (the reference
        hands bert.embedding to the dataset, train_embedding_rag.py:151)."""
        return self.embedding(tokens, af=af, pos=True,
                              deterministic=deterministic)

    def encode(self, emb, pos, af, deterministic=True):
        fused = self.emb_fusion(emb, pos, af, deterministic)
        return self.encoder(fused, None, deterministic)

    def __call__(self, x: dict, deterministic: bool = True):
        # Both haplotypes share every weight, so they ride one stacked
        # [2B, L, *] pass — half the HLO and better MXU utilization than
        # the reference's two sequential loops (src/model/bert.py:69-74).
        b = x["hap_1"].shape[0]
        toks = jnp.concatenate([x["hap_1"], x["hap_2"]], axis=0)
        af2 = jnp.concatenate([x["af"], x["af"]], axis=0)
        pos2 = jnp.concatenate([x["pos"], x["pos"]], axis=0)
        origin = self.embed(toks, af2, deterministic)
        enc = self.encode(origin, pos2, af2, deterministic)
        h1, h2 = enc[:b], enc[b:]
        return h1, h2, origin[:b], origin[b:]


class BERTWithRAG(BERT):
    """V17 token-space RAG: retrieved raw token segments are re-encoded
    through the full transformer (with remat) and fused
    (src/model/bert.py:78-129)."""

    def setup(self):
        super().setup()
        self.rag_fusion = EnhancedRareVariantFusion(self.dims,
                                                    dtype=self.dtype)

    def encode_rag_segments(self, rag_segs, pos, af, deterministic=True):
        # rag_segs: [B, K, L] -> encode each as a sequence.  The reference
        # chunks over K to bound memory (bert.py:91-114); on TPU we fold K
        # into the batch and rely on remat for the memory trade.
        b, k, l = rag_segs.shape
        flat = rag_segs.reshape(b * k, l)
        pos_f = jnp.broadcast_to(pos[:, None], (b, k, l)).reshape(b * k, l)
        af_f = jnp.broadcast_to(af[:, None], (b, k, l)).reshape(b * k, l)
        emb = self.embed(flat, af_f, deterministic)
        enc = self.encode(emb, pos_f, af_f, deterministic)
        return enc.reshape(b, k, l, -1)

    def __call__(self, x: dict, deterministic: bool = True):
        h1, h2, h1_ori, h2_ori = super().__call__(x, deterministic)
        rag_h1 = self.encode_rag_segments(x["rag_seg_h1"], x["pos"], x["af"],
                                          deterministic)
        rag_h2 = self.encode_rag_segments(x["rag_seg_h2"], x["pos"], x["af"],
                                          deterministic)
        h1 = self.rag_fusion(h1, rag_h1, x["af"], x["af_p"], deterministic)
        h2 = self.rag_fusion(h2, rag_h2, x["af"], x["af_p"], deterministic)
        return h1, h2, h1_ori, h2_ori


class BERTWithEmbeddingRAG(BERT):
    """V18 embedding-space RAG (the flagship): pre-encoded retrieved
    embeddings are emb-fused alongside the query, fused with
    EnhancedRareVariantFusion, then a single transformer pass
    (src/model/bert.py:132-218)."""

    def setup(self):
        super().setup()
        self.rag_fusion = EnhancedRareVariantFusion(self.dims,
                                                    dtype=self.dtype)

    def __call__(self, x: dict, deterministic: bool = True):
        # Weight sharing across haplotypes (and retrieved refs) lets every
        # stage run on one stacked batch: embed [2B], emb_fusion [4B],
        # rag_fusion [2B], encoder [2B] — versus the reference's per-stream
        # module calls (src/model/bert.py:148-218).
        b = x["hap_1"].shape[0]
        pos, af = x["pos"], x["af"]
        af_p = x.get("af_p", af)

        af2 = jnp.concatenate([af, af], axis=0)
        pos2 = jnp.concatenate([pos, pos], axis=0)
        if "query_emb" in x:
            # Retrieval already embedded the stacked query tokens
            # (train/retrieval.py hands it over) — skip the duplicate pass.
            origin = x["query_emb"]
        else:
            toks = jnp.concatenate([x["hap_1"], x["hap_2"]], axis=0)
            origin = self.embed(toks, af2, deterministic)  # [2B, L, D]

        if "rag_emb_h1" in x:
            # K>1 retrieved refs are averaged before fusion
            # (src/model/bert.py:176-183).
            rag1 = x["rag_emb_h1"]
            rag2 = x["rag_emb_h2"]
            rag1 = rag1.mean(axis=1) if rag1.shape[1] > 1 else rag1[:, 0]
            rag2 = rag2.mean(axis=1) if rag2.shape[1] > 1 else rag2[:, 0]

            streams = jnp.concatenate(
                [origin, rag1.astype(origin.dtype),
                 rag2.astype(origin.dtype)], axis=0)      # [4B, L, D]
            af4 = jnp.concatenate([af2, af2], axis=0)
            pos4 = jnp.concatenate([pos2, pos2], axis=0)
            fused = self.emb_fusion(streams, pos4, af4, deterministic)
            queries, rags = fused[: 2 * b], fused[2 * b :]
            h = self.rag_fusion(queries, rags[:, None],
                                jnp.concatenate([af, af], axis=0),
                                jnp.concatenate([af_p, af_p], axis=0),
                                deterministic)            # [2B, L, D]
        else:
            h = self.emb_fusion(origin, pos2, af2, deterministic)

        enc = self.encoder(h, None, deterministic)
        return enc[:b], enc[b:], origin[:b], origin[b:]
