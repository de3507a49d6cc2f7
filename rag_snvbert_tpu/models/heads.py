"""Classification heads and the foundation model wrapper.

Reference parity: src/model/foundation_model.py:13-177.

A deliberate fix (SURVEY.md section 7 "double-softmax"): the reference's
heads apply softmax inside the model and its FocalLoss softmaxes again
(foundation_model.py:80 + optim_schedule.py:73).  Here heads emit *logits*;
the genotype head still consumes softmaxed haplotype probabilities (as in
the reference, where its input really is probabilities), and
``compat_double_softmax=True`` reproduces the original behavior exactly for
apples-to-apples comparisons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bert import BERT

_xavier = nn.initializers.xavier_uniform()
_bias01 = nn.initializers.constant(0.1)


class EnhancedHaplotypeClassifier(nn.Module):
    """AF-aware per-site 2-class head (foundation_model.py:36-80)."""

    dims: int
    vocab_size: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, global_af: jax.Array,
                 pop_af: jax.Array) -> jax.Array:
        af_feat = jnp.stack([global_af, pop_af], axis=-1).astype(x.dtype)
        fused = jnp.concatenate([x, af_feat], axis=-1)
        fused = nn.Dense(4 * self.dims, kernel_init=_xavier, bias_init=_bias01)(fused)
        fused = nn.Dense(self.dims, kernel_init=_xavier,
                         bias_init=_bias01)(nn.gelu(fused))
        fused = nn.LayerNorm()(fused)
        h = nn.Dense(4 * self.dims, kernel_init=_xavier, bias_init=_bias01)(fused)
        return nn.Dense(self.vocab_size, kernel_init=_xavier,
                        bias_init=_bias01)(nn.gelu(h))  # logits


class GenotypeClassifier(nn.Module):
    """4-class genotype head over hap probabilities + genotype frequencies
    (foundation_model.py:128-177): input = [p(h1) | p(h2) | ref | het | hom]."""

    augment_factor: int = 2
    vocab_size: int = 4

    @nn.compact
    def __call__(self, hap_1_probs, hap_2_probs, ref, het, hom) -> jax.Array:
        hidden = 4 ** self.augment_factor
        feats = jnp.concatenate(
            [hap_1_probs, hap_2_probs, ref[..., None].astype(hap_1_probs.dtype),
             het[..., None].astype(hap_1_probs.dtype),
             hom[..., None].astype(hap_1_probs.dtype)], axis=-1)  # [B, L, 7]
        h = nn.leaky_relu(nn.Dense(hidden)(feats), negative_slope=0.01)
        h = nn.LayerNorm()(h)
        # FeedForward(hidden, hidden) as in the reference head
        f = nn.leaky_relu(nn.Dense(hidden)(h), negative_slope=0.1)
        f = nn.LayerNorm()(f)
        f = nn.leaky_relu(nn.Dense(hidden)(f), negative_slope=0.1)
        return nn.Dense(self.vocab_size)(f)  # logits


class BERTFoundationModel(nn.Module):
    """Encoder + dual haplotype heads + genotype head
    (foundation_model.py:13-33).

    Returns [hap_1, hap_2, gt, h1_origin, h2_origin, h1_after, h2_after]
    where hap/gt are logits (or probabilities under compat_double_softmax).
    """

    bert: BERT
    compat_double_softmax: bool = False

    def setup(self):
        self.hap_classifier = EnhancedHaplotypeClassifier(self.bert.dims)
        self.gt_classifier = GenotypeClassifier()

    def __call__(self, x: dict, deterministic: bool = True):
        h1_after, h2_after, h1_before, h2_before = self.bert(x, deterministic)
        hap_1 = self.hap_classifier(h1_after, x["af"], x["af_p"])
        hap_2 = self.hap_classifier(h2_after, x["af"], x["af_p"])
        p1 = jax.nn.softmax(hap_1, axis=-1)
        p2 = jax.nn.softmax(hap_2, axis=-1)
        gt = self.gt_classifier(p1, p2, x["ref"], x["het"], x["hom"])
        if self.compat_double_softmax:
            hap_1, hap_2 = p1, p2
            gt = jax.nn.softmax(gt, axis=-1)
        return [hap_1, hap_2, gt, h1_before, h2_before, h1_after, h2_after]

    def embed(self, tokens, af, deterministic=True):
        return self.bert.embed(tokens, af, deterministic)


def init_batch(batch_size: int, seq_len: int, dims: int, k: int = 1,
               with_rag_emb: bool = True, with_rag_seg: bool = False) -> dict:
    """A zero batch with every field the model may consume.

    Use for ``model.init``: flax only creates parameters for the branches
    the init trace touches, so the init batch must include the RAG inputs
    (``rag_emb_h*`` for BERTWithEmbeddingRAG, ``rag_seg_h*`` for
    BERTWithRAG) or later RAG-bearing applies fail with
    ScopeParamNotFoundError.
    """
    b, l = batch_size, seq_len
    zi = jnp.zeros((b, l), jnp.int32)
    zf = jnp.zeros((b, l), jnp.float32)
    x = {"hap_1": zi, "hap_2": zi, "hap_1_label": zi, "hap_2_label": zi,
         "gt_label": zi, "mask": zi, "pos": zf, "af": zf, "af_p": zf,
         "ref": zf, "het": zf, "hom": zf}
    if with_rag_emb:
        x["rag_emb_h1"] = jnp.zeros((b, k, l, dims), jnp.float32)
        x["rag_emb_h2"] = jnp.zeros((b, k, l, dims), jnp.float32)
    if with_rag_seg:
        x["rag_seg_h1"] = jnp.zeros((b, k, l), jnp.int32)
        x["rag_seg_h2"] = jnp.zeros((b, k, l), jnp.int32)
    return x
