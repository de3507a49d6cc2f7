"""Fusion modules: embedding-level feature fusion and RAG fusion.

Reference parity:
  - PositionFeatModule: 3x Conv1d(k=9) + LeakyReLU(0.05) + norm over the
    position channel (src/model/fusion.py:285-332).  The reference forces
    fp32 + BatchNorm1d there purely to dodge a cuDNN fp16 layout bug — not a
    TPU concern; we default to stateless GroupNorm (no running stats to
    thread through pjit) with ``norm="batch"`` available for strict parity.
  - EmbeddingFusionModule: LN(emb + LeakyReLU(Dense([emb, pos_feat, af])))
    (src/model/fusion.py:336-369)
  - CrossAFInteraction gate over (global_af, pop_af)
    (src/model/fusion.py:58-86)
  - EnhancedRareVariantFusion: AF-adapter sigmoid weighting, softmax pooling
    over K retrieved refs, concat-MLP fuse, MAF-inverse log1p residual with
    learnable 0.1 scale (src/model/fusion.py:89-162)
  - Alternative fusions kept as capability parity: RareVariantAwareFusion
    (:165-199), FixedConcatFusion (:202-220), ConcatFusion (:223-253),
    CrossAttentionFusion (:255-283).  The broken LDGuidedRetention (:5-55)
    is intentionally not rebuilt (dead + unrunnable in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_normal()
_bias01 = nn.initializers.constant(0.1)
_bias001 = nn.initializers.constant(0.01)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm whose statistics live in ``params``.

    Exists for torch-checkpoint interop (interop/torch_ckpt.py): the
    reference's PositionFeatModule normalizes with BatchNorm1d
    (src/model/fusion.py:312-314), so a trained reference checkpoint
    carries running_mean/running_var that must ride along in conversion.
    Storing them as stop-gradient *parameters* (rather than a
    ``batch_stats`` collection) keeps every existing apply site working
    unchanged, and a fine-tune cannot drift the frozen statistics —
    matching torch fine-tuning practice of keeping BN in eval mode."""

    eps: float = 1e-5  # torch BatchNorm1d default

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jax.lax.stop_gradient(
            self.param("mean", nn.initializers.zeros, (c,)))
        var = jax.lax.stop_gradient(
            self.param("var", nn.initializers.ones, (c,)))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class PositionFeatModule(nn.Module):
    """1D conv stack over the normalized-position channel."""

    hidden_channels: int = 4
    kernel_size: int = 9
    norm: str = "group"  # "group" (stateless) | "none" | "batch" |
    # "frozen_batch" (converted torch checkpoints)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos: jax.Array, deterministic: bool = True) -> jax.Array:
        # pos: [B, L] -> [B, L, 1] (flax convs are NLC)
        h = pos[..., None].astype(jnp.float32)

        def norm_layer(x):
            if self.norm == "group":
                return nn.GroupNorm(num_groups=1)(x)
            if self.norm == "batch":
                return nn.BatchNorm(use_running_average=deterministic)(x)
            if self.norm == "frozen_batch":
                return FrozenBatchNorm()(x)
            return x

        h = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")(h)
        h = norm_layer(nn.leaky_relu(h, negative_slope=0.05))
        h = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")(h)
        h = norm_layer(nn.leaky_relu(h, negative_slope=0.05))
        h = nn.Conv(1, (self.kernel_size,), padding="SAME")(h)
        h = nn.leaky_relu(h, negative_slope=0.05)
        return h[..., 0]  # [B, L]


class EmbeddingFusionModule(nn.Module):
    """Add positional conv feature + raw AF channel to the embedding."""

    emb_size: int
    pos_norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array, pos: jax.Array, af: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        pos_feat = PositionFeatModule(norm=self.pos_norm, name="pos_feat")(
            pos, deterministic)[..., None].astype(emb.dtype)
        af_feat = af[..., None].astype(emb.dtype)
        all_feat = jnp.concatenate([emb, pos_feat, af_feat], axis=-1)
        all_feat = nn.leaky_relu(
            nn.Dense(self.emb_size, name="fusion", dtype=self.dtype)(all_feat),
            negative_slope=0.1)
        return nn.LayerNorm(dtype=self.dtype)(emb + all_feat)


class CrossAFInteraction(nn.Module):
    """Gated interaction of global and population allele frequencies."""

    dims: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, global_af: jax.Array, pop_af: jax.Array) -> jax.Array:
        combined = jnp.stack([global_af, pop_af], axis=-1).astype(self.dtype)
        gate = nn.Dense(32, kernel_init=_xavier, bias_init=_bias001,
                        dtype=self.dtype)(combined)
        gate = nn.Dense(self.dims, kernel_init=_xavier, bias_init=_bias001,
                        dtype=self.dtype)(nn.gelu(gate))
        gate = nn.sigmoid(gate)
        enc = nn.Dense(self.dims, kernel_init=_xavier, bias_init=_bias001,
                       dtype=self.dtype)(combined)
        enc = nn.gelu(nn.LayerNorm(dtype=self.dtype)(enc))
        res_scale = self.param("res_scale",
                               lambda _: jnp.asarray(0.1, jnp.float32))
        return (global_af[..., None].astype(self.dtype)
                + res_scale.astype(self.dtype) * (gate * enc))


class EnhancedRareVariantFusion(nn.Module):
    """Main RAG fusion: AF-weighted pooling of retrieved refs + MAF-inverse
    residual (the V18 default, src/model/fusion.py:89-162)."""

    dims: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, orig_feat: jax.Array, rag_feat: jax.Array,
                 global_af: jax.Array, pop_af: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        # orig_feat: [B, L, D]; rag_feat: [B, K, L, D]
        fused_af = CrossAFInteraction(self.dims, dtype=self.dtype,
                                      name="af_interaction")(
            global_af, pop_af)  # [B, L, D]

        w = nn.Dense(4 * self.dims, kernel_init=_xavier, bias_init=_bias01,
                     dtype=self.dtype)(fused_af)
        w = nn.Dropout(self.dropout)(nn.gelu(w), deterministic=deterministic)
        w = nn.Dense(self.dims, kernel_init=_xavier, bias_init=_bias01,
                     dtype=self.dtype)(w)
        af_weight = nn.sigmoid(w)  # [B, L, D]

        weighted_ref = rag_feat * af_weight[:, None].astype(rag_feat.dtype)
        weighted_ref = weighted_ref.transpose(0, 2, 1, 3)  # [B, L, K, D]

        pool_logits = nn.Dense(1, kernel_init=_xavier, bias_init=_bias01,
                               dtype=self.dtype, name="pooling")(weighted_ref)
        pool_w = jax.nn.softmax(pool_logits, axis=2)  # softmax over K
        pooled_ref = jnp.sum(weighted_ref * pool_w, axis=2)  # [B, L, D]

        fused = jnp.concatenate([orig_feat, pooled_ref], axis=-1)
        fused = nn.Dense(4 * self.dims, kernel_init=_xavier, bias_init=_bias01,
                         dtype=self.dtype)(fused)
        fused = nn.Dropout(self.dropout)(nn.gelu(fused), deterministic=deterministic)
        fused = nn.Dense(self.dims, kernel_init=_xavier, bias_init=_bias01,
                         dtype=self.dtype)(fused)
        fused = nn.LayerNorm(dtype=self.dtype)(fused)

        maf = jnp.minimum(global_af, 1.0 - global_af)[..., None]
        maf_weight = jnp.clip(jnp.log1p(1.0 / (maf + 1e-6)), max=3.0)
        res_scale = self.param("res_scale",
                               lambda _: jnp.asarray(0.1, jnp.float32))
        return orig_feat + res_scale * (fused * maf_weight.astype(fused.dtype))


class RareVariantAwareFusion(nn.Module):
    """Alternative fusion (src/model/fusion.py:165-199)."""

    dims: int

    @nn.compact
    def __call__(self, orig_feat, rag_feat, af):
        w = nn.Dense(16)(af[..., None])
        w = nn.sigmoid(nn.Dense(self.dims)(nn.relu(w)))  # [B, L, D]
        weighted = rag_feat * w[:, None].astype(rag_feat.dtype)
        pooled = 0.7 * weighted.mean(axis=1) + 0.3 * weighted.max(axis=1)
        fused = jnp.concatenate([orig_feat, pooled], axis=-1)
        fused = nn.gelu(nn.LayerNorm()(nn.Dense(self.dims)(fused)))
        maf_w = jnp.sqrt(af * (1 - af))[..., None]
        return orig_feat + fused * maf_w.astype(fused.dtype)


class FixedConcatFusion(nn.Module):
    """Mean-pool + concat + 0.1-scaled residual (src/model/fusion.py:202-220)."""

    dims: int

    @nn.compact
    def __call__(self, orig_feat, rag_feat):
        pooled = rag_feat.mean(axis=1)
        fused = jnp.concatenate([orig_feat, pooled], axis=-1)
        fused = nn.gelu(nn.LayerNorm()(nn.Dense(self.dims)(fused)))
        return orig_feat + 0.1 * fused


class ConcatFusion(nn.Module):
    """Mean+max pooling, 1x1 'conv' fuse (a Dense in NLC layout),
    residual (src/model/fusion.py:223-253)."""

    dims: int

    @nn.compact
    def __call__(self, orig_feat, rag_feat):
        pooled = 0.5 * rag_feat.mean(axis=1) + 0.5 * rag_feat.max(axis=1)
        combined = jnp.concatenate([orig_feat, pooled], axis=-1)
        return orig_feat + nn.Dense(self.dims)(combined)


class CrossAttentionFusion(nn.Module):
    """Per-retrieved-ref cross attention, mean over K
    (src/model/fusion.py:255-283) — vectorized over K instead of the
    reference's python loop."""

    dims: int
    heads: int = 8

    @nn.compact
    def __call__(self, orig_feat, rag_feat, deterministic: bool = True):
        b, k, l, d = rag_feat.shape
        attn = nn.MultiHeadDotProductAttention(num_heads=self.heads,
                                               qkv_features=d)
        q = jnp.broadcast_to(orig_feat[:, None], (b, k, l, d)).reshape(b * k, l, d)
        kv = rag_feat.reshape(b * k, l, d)
        out = attn(q, kv, deterministic=deterministic)
        return orig_feat + out.reshape(b, k, l, d).mean(axis=1)
