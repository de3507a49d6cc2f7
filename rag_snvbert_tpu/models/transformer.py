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
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn


def _fused_attention_available() -> bool:
    """Pallas attention kernels require a real TPU backend.  Presets that
    request flash/splash still work on the CPU test mesh and in the
    multi-chip dry run: off-TPU the module silently takes the XLA einsum
    path, which computes the same function (exact softmax attention).

    A pinned ``jax_default_device`` wins over ``default_backend()``:
    the remote axon TPU registers as the default backend even when
    JAX_PLATFORMS=cpu pins all work to host devices (tests, dry runs).
    """
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return getattr(dev, "platform", None) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _flash_attention(q, k, v, sm_scale, block: int = 384):
    """Fused flash attention via the Pallas TPU kernel: never materializes
    the [L, L] score matrix in HBM — the dominant memory-traffic term of
    XLA attention at L ~ 1030.

    The kernel wants sequence length divisible by its block size and the
    head dim on full 128 lanes, so q/k/v are zero-padded: extra head-dim
    columns contribute 0 to every dot product (scores unchanged) and
    padded key rows are excluded via segment ids.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, l, hd = q.shape
    lp = -(-l // block) * block
    hdp = max(128, -(-hd // 128) * 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, hdp - hd)))

    seg = (jnp.arange(lp) < l).astype(jnp.int32)[None, :]
    seg = jnp.broadcast_to(seg, (b, lp))
    sizes = fa.BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block)
    out = fa.flash_attention(pad(q), pad(k), pad(v),
                             segment_ids=fa.SegmentIds(q=seg, kv=seg),
                             sm_scale=sm_scale, block_sizes=sizes)
    return out[:, :, :l, :hd]


def _parse_splash_spec(flash: str) -> tuple[int, int, bool]:
    """Parse "splash[:BQ[xBKV][f]]" -> (block_q, block_kv, fused_bwd)."""
    _, _, blk = flash.partition(":")
    fused_bwd = blk.endswith("f")
    blk = blk.rstrip("f")
    bq, _, bkv = blk.partition("x")
    block = int(bq) if bq else 384
    return block, int(bkv) if bkv else block, fused_bwd or not blk


def splash_padded_len(flash: str, l: int) -> int:
    """Sequence length the splash kernel runs at for input length ``l``
    (next multiple of lcm(block_q, block_kv)).  The Encoder uses this to
    pre-pad its residency ONCE instead of every layer re-padding q/k/v
    per step (round-4 VERDICT item 3: pad/copy/slice_bitcast were 13.7%
    of the traced train step)."""
    import math

    block, bkv, _ = _parse_splash_spec(flash)
    lcm = block * bkv // math.gcd(block, bkv)
    return -(-l // lcm) * lcm


def _splash_attention(q, k, v, sm_scale, block: int = 384,
                      block_kv: int | None = None,
                      fused_bwd: bool = True,
                      interpret: bool = False,
                      valid_len: int | None = None):
    """Fused attention via the splash-attention Pallas kernel (fwd + bwd
    kernels; never materializes [L, L] scores in HBM).

    Padding strategy: L is zero-padded up to a block multiple and the
    padding is encoded in the kernel's *static* block-sparse mask, so
    fully-invalid tiles are skipped at trace time rather than masked at
    run time; padded rows/cols of the output are sliced off.

    ``valid_len``: when the CALLER already runs at the padded length
    (Encoder pre-pad), the true sequence length for the static mask —
    the pads/slices here become no-ops and the output keeps the padded
    length.  Exactness is unchanged: the mask excludes padded keys from
    every query's softmax, so valid rows never see padding.
    """
    import math

    import numpy as np
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    b, h, l, hd = q.shape
    vl = l if valid_len is None else valid_len
    bkv = block_kv or block
    lcm = block * bkv // math.gcd(block, bkv)
    lp = -(-l // lcm) * lcm
    hdp = max(128, -(-hd // 128) * 128)

    def pad(x):
        if lp == l and hdp == hd:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, hdp - hd)))

    qp = pad(q * sm_scale)
    kp, vp = pad(k), pad(v)
    valid = np.arange(lp) < vl
    head_mask = sm.NumpyMask(valid[:, None] & valid[None, :])
    mask = sm.MultiHeadMask([head_mask] * h)
    if fused_bwd:
        bs = sk.BlockSizes(
            block_q=block, block_kv=bkv, block_kv_compute=bkv,
            block_q_dkv=block, block_kv_dkv=bkv,
            block_kv_dkv_compute=bkv, use_fused_bwd_kernel=True)
    else:
        bs = sk.BlockSizes(
            block_q=block, block_kv=bkv, block_kv_compute=bkv,
            block_q_dkv=block, block_kv_dkv=bkv,
            block_kv_dkv_compute=bkv,
            block_q_dq=block, block_kv_dq=bkv)
    kernel = sk.make_splash_mha(mask, block_sizes=bs, head_shards=1,
                                q_seq_shards=1, interpret=interpret)
    out = jax.vmap(kernel)(qp, kp, vp)
    return out[:, :, :l, :hd]


class MultiHeadAttention(nn.Module):
    heads: int
    dims: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attn_dropout: float | None = None  # None -> same as dropout.  Set 0 to
    # skip the [B,H,L,L] bernoulli mask — its RNG temps dominate HBM at
    # L~1030 and remat must keep them; modern practice drops only residuals.
    flash: bool | str = False  # fused Pallas attention path (TPU):
    # True/"flash" = jax flash-attention kernel; "splash[:block]" = the
    # splash-attention kernel (static block-sparse padding mask, fused
    # bwd).  Requires attn_dropout == 0 and no explicit attention mask.
    remat: bool = False        # checkpoint this attention only (selective
    # remat: the [B,H,L,L] intermediates are recomputed in backward while
    # the cheap-to-store FFN activations are kept).
    score_dtype: jnp.dtype = jnp.float32  # XLA-path score matrix dtype;
    # bf16 halves the dominant HBM traffic term at a small numeric cost.
    fused_qkv: bool = False    # one [D, 3D] projection instead of three
    # [D, D] matmuls — fewer, fatter MXU dispatches (changes the param
    # tree: 'qkv' kernel instead of query/key/value).
    quant: bool = False        # int8 forward+backward projection matmuls
    # (ops/quant.Int8Dense — the MXU double-rate path; same param tree).
    valid_len: int | None = None  # true sequence length when the caller
    # pre-padded x to the splash block multiple (Encoder pad-once path);
    # only the splash static mask consumes it.

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        b, l, d = x.shape
        assert d % self.heads == 0
        hd = d // self.heads
        attn_rate = self.dropout if self.attn_dropout is None else self.attn_dropout
        from ..ops.quant import dense_cls
        Dense = dense_cls(self.quant)

        if self.fused_qkv:
            qkv = Dense(3 * d, name="qkv", dtype=self.dtype)(x)
            qkv = qkv.reshape(b, l, 3, self.heads, hd)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        else:
            def proj(name):
                return Dense(d, name=name, dtype=self.dtype)(x).reshape(
                    b, l, self.heads, hd)

            q = proj("query").transpose(0, 2, 1, 3)  # [B, H, L, hd]
            k = proj("key").transpose(0, 2, 1, 3)
            v = proj("value").transpose(0, 2, 1, 3)

        if (self.flash and mask is None and attn_rate == 0.0
                and _fused_attention_available()):
            scale = 1.0 / float(hd) ** 0.5
            if isinstance(self.flash, str) and self.flash.startswith("splash"):
                # "splash[:BQ[xBKV][f]]" — block sizes; trailing f = fused
                # dq/dkv backward kernel (measured fastest at 384f).
                block, bkv, fused_bwd = _parse_splash_spec(self.flash)
                out = _splash_attention(q, k, v, scale, block=block,
                                        block_kv=bkv, fused_bwd=fused_bwd,
                                        valid_len=self.valid_len)
            else:
                out = _flash_attention(q, k, v, sm_scale=scale)
        else:
            score = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                               preferred_element_type=self.score_dtype)
            score = score / jnp.sqrt(jnp.asarray(hd, score.dtype))
            if mask is not None:
                score = jnp.where(mask == 0,
                                  jnp.asarray(-1e9, score.dtype), score)
            # Named so remat="save_most" can drop ONLY these [B,H,L,L]
            # tensors (the dominant activation-memory term at L ~ 1030)
            # and keep every cheap-to-store activation.
            score = checkpoint_name(score, "attn_scores")
            probs = jax.nn.softmax(score, axis=-1).astype(self.dtype)
            probs = checkpoint_name(probs, "attn_probs")
            probs = nn.Dropout(attn_rate)(probs, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return Dense(d, name="output", dtype=self.dtype)(out)


class FeedForward(nn.Module):
    dims: int
    hidden_dims: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    dropout_broadcast: bool = False
    quant: bool = False        # int8 matmuls (see MultiHeadAttention.quant)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from ..ops.quant import dense_cls
        Dense = dense_cls(self.quant)
        h = nn.leaky_relu(Dense(self.hidden_dims, name="w_1",
                                dtype=self.dtype)(x), negative_slope=0.1)
        # Named for selective remat policies: saving this tensor skips
        # recomputing the block's largest matmul in the backward pass at
        # ~150 MB/layer (bf16, flagship shapes).
        h = checkpoint_name(h, "ffn_hidden")
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.leaky_relu(Dense(self.dims, name="w_2",
                                dtype=self.dtype)(h), negative_slope=0.1)
        bdims = (1,) if self.dropout_broadcast else ()
        return nn.Dropout(self.dropout, broadcast_dims=bdims)(
            h, deterministic=deterministic)


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
    dtype: jnp.dtype = jnp.float32
    attn_dropout: float | None = None
    flash: bool | str = False
    score_dtype: jnp.dtype = jnp.float32
    attn_remat: bool = False
    dropout_broadcast: bool = False  # share residual-dropout masks across
    # the sequence dim ([B,1,D] instead of [B,L,D]): ~1000x fewer random
    # bits per mask at L~1030 — an opt-in perf knob with a (mild) semantic
    # change from the reference's per-position masks.
    fused_qkv: bool = False
    quant: bool = False
    valid_len: int | None = None  # see MultiHeadAttention.valid_len

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        attn_cls = MultiHeadAttention
        if self.attn_remat:
            attn_cls = nn.remat(MultiHeadAttention, static_argnums=(3,))
        attn = attn_cls(self.attn_heads, self.dims, self.dropout,
                        dtype=self.dtype,
                        attn_dropout=self.attn_dropout,
                        flash=self.flash,
                        score_dtype=self.score_dtype,
                        fused_qkv=self.fused_qkv,
                        quant=self.quant,
                        valid_len=self.valid_len,
                        name="attention")
        ffn = FeedForward(self.dims, self.feed_forward_hidden, self.dropout,
                          dtype=self.dtype,
                          dropout_broadcast=self.dropout_broadcast,
                          quant=self.quant,
                          name="feed_forward")
        bdims = (1,) if self.dropout_broadcast else ()
        drop = lambda y: nn.Dropout(self.dropout, broadcast_dims=bdims)(
            y, deterministic=deterministic)

        x = x.astype(self.dtype)
        if self.pre_ln:
            x = x + drop(attn(nn.LayerNorm(dtype=self.dtype)(x), mask,
                              deterministic))
            x = x + drop(ffn(nn.LayerNorm(dtype=self.dtype)(x), deterministic))
            return x

        # Reference post-LN: dropout(LN(x + sublayer(x))) twice, then dropout.
        x = drop(nn.LayerNorm(dtype=self.dtype)(x + attn(x, mask, deterministic)))
        x = drop(nn.LayerNorm(dtype=self.dtype)(x + ffn(x, deterministic)))
        return drop(x)


class _CarryBlock(TransformerBlock):
    """TransformerBlock with (carry, output) calling convention for
    nn.scan: the layer output is the next carry, no per-layer ys."""

    def __call__(self, x, mask=None, deterministic=True):
        return super().__call__(x, mask, deterministic), None


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
    remat: bool | str = False   # True = checkpoint whole blocks;
    # "save_ffn" = block remat that still saves the named ffn_hidden
    # tensors (skips recomputing the largest matmul at ~150 MB/layer —
    # measured slightly SLOWER than full-block remat at flagship scale,
    # 177 vs 168 ms: the extra HBM round trips outweigh the recompute);
    # "save_most" = store everything EXCEPT the [B,H,L,L] attention
    # score/prob tensors (backward recomputes just the two attention
    # einsums + softmax) — NOTE: at flagship scale (12L, 48 streams,
    # L=1030) the stored activations exceed HBM and compilation fails;
    # at that scale use remat=False with scan=False (165.6 ms/step
    # measured) or full-block remat (199.7 ms) instead;
    # "attention" = checkpoint only the attention sublayer (stores FFN
    # activations, recomputes the [L,L] intermediates).  At the flagship
    # scale (12L, 48 streams, L=1030) attention-only remat needs ~20 GB
    # HBM — use full-block or save_most remat there.
    dtype: jnp.dtype = jnp.float32
    attn_dropout: float | None = None
    flash: bool | str = False
    score_dtype: jnp.dtype = jnp.float32
    scan: bool = False  # lax.scan over layers: one traced block body
    # instead of n_layers inlined copies — ~10x smaller HLO / compile time.
    # Parameters gain a leading [n_layers] axis under this layout.
    dropout_broadcast: bool = False  # see TransformerBlock.dropout_broadcast
    fused_qkv: bool = False          # see MultiHeadAttention.fused_qkv
    quant: bool = False              # int8 encoder matmuls (ops/quant)

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        # Pad-once residency for the splash path (round-4 VERDICT item 3):
        # when every layer would route to the splash kernel, zero-pad the
        # sequence to the kernel's block multiple HERE — every layer then
        # runs pad-free at L_pad (the kernel's static mask still excludes
        # the padded keys via valid_len, so valid-row outputs are exactly
        # the unpadded function's) and the per-layer pad + slice_bitcast +
        # copy ops (13.7% of the traced r4 train step: 48 pads + 36
        # slices/step at L 1030->1152) collapse into one pad + one slice
        # per encoder call.  The padded rows cost ~12% extra Dense/LN/FFN
        # arithmetic; the measured trade is recorded in DESIGN section 4.
        attn_rate = (self.dropout if self.attn_dropout is None
                     else self.attn_dropout)
        use_splash = (isinstance(self.flash, str)
                      and self.flash.startswith("splash")
                      and mask is None and attn_rate == 0.0
                      and _fused_attention_available())
        l0 = x.shape[1]
        lp = splash_padded_len(self.flash, l0) if use_splash else l0
        valid_len = l0 if lp != l0 else None
        if lp != l0:
            x = jnp.pad(x, ((0, 0), (0, lp - l0), (0, 0)))

        attn_remat = self.remat == "attention"
        block_remat = self.remat in (True, "save_ffn", "save_most")
        policy = None
        if self.remat == "save_ffn":
            policy = jax.checkpoint_policies.save_only_these_names(
                "ffn_hidden")
        elif self.remat == "save_most":
            # Surgical policy: store every activation except the [B,H,L,L]
            # score/prob tensors — backward recomputes only the two
            # attention einsums + softmax (trivial FLOPs; the win is not
            # re-running the whole block like full remat does).
            policy = jax.checkpoint_policies.save_anything_except_these_names(
                "attn_scores", "attn_probs")
        block_cls = TransformerBlock
        if block_remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,),
                                 policy=policy)
        x = x.astype(self.dtype)  # scan carry must be type-stable
        if self.scan:
            inner = _CarryBlock
            if block_remat:
                inner = nn.remat(_CarryBlock, static_argnums=(3,),
                                 policy=policy)
            scan_cls = nn.scan(
                inner,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.n_layers,
            )
            x, _ = scan_cls(self.dims, self.attn_heads, 4 * self.dims,
                            self.dropout, self.pre_ln, self.dtype,
                            self.attn_dropout, self.flash, self.score_dtype,
                            attn_remat, self.dropout_broadcast,
                            self.fused_qkv, self.quant,
                            valid_len=valid_len,
                            name="blocks")(x, mask, deterministic)
            return x[:, :l0] if valid_len is not None else x
        for i in range(self.n_layers):
            x = block_cls(self.dims, self.attn_heads, 4 * self.dims,
                          self.dropout, self.pre_ln, self.dtype,
                          self.attn_dropout, self.flash, self.score_dtype,
                          attn_remat, self.dropout_broadcast,
                          self.fused_qkv, self.quant,
                          valid_len=valid_len,
                          name=f"block_{i}")(x, mask, deterministic)
        return x[:, :l0] if valid_len is not None else x
