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

import jax
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

    def setup(self):
        self.embedding = BERTEmbedding(self.vocab_size, self.dims, self.dropout)
        self.emb_fusion = EmbeddingFusionModule(self.dims)
        self.encoder = Encoder(self.n_layers, self.dims, self.attn_heads,
                               self.dropout, self.pre_ln, self.remat)

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
        h1_origin = self.embed(x["hap_1"], x["af"], deterministic)
        h2_origin = self.embed(x["hap_2"], x["af"], deterministic)
        h1 = self.encode(h1_origin, x["pos"], x["af"], deterministic)
        h2 = self.encode(h2_origin, x["pos"], x["af"], deterministic)
        return h1, h2, h1_origin, h2_origin


class BERTWithRAG(BERT):
    """V17 token-space RAG: retrieved raw token segments are re-encoded
    through the full transformer (with remat) and fused
    (src/model/bert.py:78-129)."""

    def setup(self):
        super().setup()
        self.rag_fusion = EnhancedRareVariantFusion(self.dims)

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
        self.rag_fusion = EnhancedRareVariantFusion(self.dims)

    def __call__(self, x: dict, deterministic: bool = True):
        h1_origin = self.embed(x["hap_1"], x["af"], deterministic)
        h2_origin = self.embed(x["hap_2"], x["af"], deterministic)

        pos, af = x["pos"], x["af"]
        af_p = x.get("af_p", af)

        if "rag_emb_h1" in x:
            # K>1 retrieved refs are averaged before fusion
            # (src/model/bert.py:176-183).
            rag1 = x["rag_emb_h1"]
            rag2 = x["rag_emb_h2"]
            rag1 = rag1.mean(axis=1) if rag1.shape[1] > 1 else rag1[:, 0]
            rag2 = rag2.mean(axis=1) if rag2.shape[1] > 1 else rag2[:, 0]

            h1 = self.emb_fusion(h1_origin, pos, af, deterministic)
            h2 = self.emb_fusion(h2_origin, pos, af, deterministic)
            rag1 = self.emb_fusion(rag1.astype(h1.dtype), pos, af, deterministic)
            rag2 = self.emb_fusion(rag2.astype(h2.dtype), pos, af, deterministic)

            h1 = self.rag_fusion(h1, rag1[:, None], af, af_p, deterministic)
            h2 = self.rag_fusion(h2, rag2[:, None], af, af_p, deterministic)
        else:
            h1 = self.emb_fusion(h1_origin, pos, af, deterministic)
            h2 = self.emb_fusion(h2_origin, pos, af, deterministic)

        h1 = self.encoder(h1, None, deterministic)
        h2 = self.encoder(h2, None, deterministic)
        return h1, h2, h1_origin, h2_origin
