"""Embedding stack: haplotype tokens + sinusoidal positions + Fourier AF.

Reference parity (behavior, not code):
  - token embedding with zeroed pad row  (src/model/embedding/token.py:3-19,
    nn.Embedding(padding_idx=0))
  - fixed sinusoidal positional table over MAX_SEQ_LEN
    (src/model/embedding/position.py:9-38)
  - Fourier-feature AF embedding with learnable log-spaced basis
    (src/model/embedding/af_embedding.py:17-106)
  - sum fusion tok + pos + af, then dropout
    (src/model/embedding/bert.py:11-75)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..io.vocab import MAX_SEQ_LEN, PAD

_xavier = nn.initializers.xavier_normal()


def sinusoidal_table(max_len: int, dims: int, dtype=jnp.float32) -> jax.Array:
    """Classic transformer sin/cos table [max_len, dims]."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dims, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / dims))
    ang = position * div_term
    pe = jnp.zeros((max_len, dims), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang[:, : pe[:, 1::2].shape[1]]))
    return pe.astype(dtype)


class AFEmbedding(nn.Module):
    """Fourier-feature embedding of continuous allele frequencies.

    sin/cos of ``2*pi*af*f_b`` over learnable log-spaced basis frequencies,
    projected Dense -> LayerNorm -> GELU -> Dense.
    """

    embed_size: int
    num_basis: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, af: jax.Array) -> jax.Array:  # [B, L] -> [B, L, D]
        init_freqs = jnp.logspace(0.0, math.log10(100.0), self.num_basis)
        basis = self.param("basis_freqs", lambda _: init_freqs.astype(jnp.float32))
        expanded = af[..., None] * basis  # [B, L, nb]
        feats = jnp.concatenate(
            [jnp.sin(2 * math.pi * expanded), jnp.cos(2 * math.pi * expanded)],
            axis=-1)
        h = nn.Dense(self.embed_size, kernel_init=_xavier,
                     dtype=self.dtype)(feats.astype(self.dtype))
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.gelu(h)
        return nn.Dense(self.embed_size, kernel_init=_xavier,
                        dtype=self.dtype)(h)


class BERTEmbedding(nn.Module):
    """Token + positional + AF embeddings, summed, then dropout.

    The pad token's embedding row is forced to zero (torch
    ``padding_idx=0`` semantics) by masking the lookup output.
    """

    vocab_size: int
    embed_size: int
    dropout: float = 0.1
    use_af: bool = True
    max_len: int = MAX_SEQ_LEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq: jax.Array, af: jax.Array | None = None,
                 pos: bool = True, deterministic: bool = True) -> jax.Array:
        tok = nn.Embed(self.vocab_size, self.embed_size,
                       embedding_init=nn.initializers.normal(1.0),
                       dtype=self.dtype)(seq)
        tok = tok * (seq != PAD)[..., None].astype(tok.dtype)
        out = tok
        if pos:
            pe = sinusoidal_table(self.max_len, self.embed_size, tok.dtype)
            out = out + pe[None, : seq.shape[-1], :]
        if self.use_af and af is not None:
            out = out + AFEmbedding(self.embed_size,
                                    dtype=self.dtype)(af.astype(jnp.float32))
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
