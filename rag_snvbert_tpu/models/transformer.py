"""Transformer encoder blocks with the reference's (nonstandard) post-LN
topology reproduced faithfully, plus a cleaner pre-LN variant behind a flag.

Reference parity:
  - scaled-dot-product attention, mask fill -1e9, attention-prob dropout
    (src/model/attention/attention.py:8-31)
  - MHA: 3 projections, reshape to heads, output projection
    (src/model/attention/multi_head_attention.py:6-51)
  - FeedForward: Dense -> LeakyReLU(0.1) -> LayerNorm -> Dense ->
    LeakyReLU(0.1) -> Dropout (src/model/utils/feed_forward.py:4-21)
  - SublayerConnection: dropout(LN(x + f(x))) — dropout *after* the norm
    (src/model/utils/sublayer.py:4-16)
  - TransformerBlock: attn sublayer, ffn sublayer, trailing dropout
    (src/model/transformer.py:8-35)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiHeadAttention(nn.Module):
    heads: int
    dims: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        b, l, d = x.shape
        assert d % self.heads == 0
        hd = d // self.heads

        def proj(name):
            return nn.Dense(d, name=name)(x).reshape(b, l, self.heads, hd)

        q = proj("query").transpose(0, 2, 1, 3)  # [B, H, L, hd]
        k = proj("key").transpose(0, 2, 1, 3)
        v = proj("value").transpose(0, 2, 1, 3)

        score = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
        score = score / jnp.sqrt(jnp.asarray(hd, score.dtype))
        if mask is not None:
            score = jnp.where(mask == 0, jnp.asarray(-1e9, score.dtype), score)
        probs = jax.nn.softmax(score, axis=-1).astype(x.dtype)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, name="output")(out)


class FeedForward(nn.Module):
    dims: int
    hidden_dims: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.leaky_relu(nn.Dense(self.hidden_dims, name="w_1")(x),
                          negative_slope=0.1)
        h = nn.LayerNorm()(h)
        h = nn.leaky_relu(nn.Dense(self.dims, name="w_2")(h),
                          negative_slope=0.1)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class TransformerBlock(nn.Module):
    """One encoder block.

    ``pre_ln=False`` reproduces the reference topology exactly:
    ``x = dropout(LN(x + f(x)))`` per sublayer and a trailing dropout.
    ``pre_ln=True`` is the standard pre-norm variant (better-conditioned;
    offered as the non-compat default for new configs).
    """

    dims: int
    attn_heads: int
    feed_forward_hidden: int
    dropout: float = 0.1
    pre_ln: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        attn = MultiHeadAttention(self.attn_heads, self.dims, self.dropout,
                                  name="attention")
        ffn = FeedForward(self.dims, self.feed_forward_hidden, self.dropout,
                          name="feed_forward")
        drop = lambda y: nn.Dropout(self.dropout)(y, deterministic=deterministic)

        if self.pre_ln:
            x = x + drop(attn(nn.LayerNorm()(x), mask, deterministic))
            x = x + drop(ffn(nn.LayerNorm()(x), deterministic))
            return x

        # Reference post-LN: dropout(LN(x + sublayer(x))) twice, then dropout.
        x = drop(nn.LayerNorm()(x + attn(x, mask, deterministic)))
        x = drop(nn.LayerNorm()(x + ffn(x, deterministic)))
        return drop(x)


class Encoder(nn.Module):
    """Stack of transformer blocks with optional remat (jax.checkpoint).

    Remat replaces the reference's torch.utils.checkpoint on the V17 RAG
    re-encode path (src/model/bert.py:106-110) and is available for the
    main trunk too — the TPU way to trade FLOPs for HBM.
    """

    n_layers: int
    dims: int
    attn_heads: int
    dropout: float = 0.1
    pre_ln: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        for i in range(self.n_layers):
            x = block_cls(self.dims, self.attn_heads, 4 * self.dims,
                          self.dropout, self.pre_ln,
                          name=f"block_{i}")(x, mask, deterministic)
        return x
