"""int8 quantized matmul for encoder Dense layers (AQT-style).

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate; the encoder
matmuls (QKV/output projections + FFN) carry ~all the train-step FLOPs, so
dynamic int8 quantization is the main raw-speed lever past the bf16
ceiling (ROADMAP round-3 item 1; the reference trains plain fp16/32 —
no analogue, this is a TPU-native extension).

Scheme (symmetric, dynamic, no calibration state):
  y = (q(x) @ q(w)) * sx * sw,  q(t) = round(clip(t/s, +-127)), s = amax/127
with scale granularity always per-index of a NON-contracted axis (constant
along the contraction axis, so it factors out of the dot exactly).
Quantization is straight-through (gradients flow as if the matmul were
exact — standard AQT practice).

Layout discipline: scales are reduced along whichever axis the dot
contracts IN PLACE — never via `.T` on the int8 tensors.  An explicit
transpose of an int8 array is a real relayout copy on TPU (int8 tiles are
(32,128)); the first version of this file transposed weights twice per
matmul and measured 177 ms/step vs the 130 ms bf16 baseline.  All
transposition here is expressed through dot_general dimension numbers,
which fold into the MXU op.

Two modes:
  - "fwd": int8 forward matmul, bf16 backward (custom_vjp over the
    quantized forward with exact-matmul gradients).
  - "fwd_bwd" (`int8_matmuls=True`): both grad matmuls quantized too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _quant(t: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 along `axis` (the contraction axis of the coming
    dot): returns (q int8, scale f32 with keepdims)."""
    amax = jnp.max(jnp.abs(t), axis=axis, keepdims=True)
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    q = jnp.clip(jnp.round(t / scale.astype(t.dtype)), -127, 127)
    return q.astype(jnp.int8), scale


def _int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """[.., K] @ [K, N] on the int8 MXU path, rescaled to x.dtype."""
    xq, sx = _quant(x, -1)                     # [.., K], [.., 1]
    wq, sw = _quant(w, 0)                      # [K, N],  [1, N]
    y = jax.lax.dot_general(xq, wq,
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


def _int8_dx(g: jax.Array, w: jax.Array) -> jax.Array:
    """dx = g @ w.T quantized: [.., N] x [K, N] -> [.., K] (contract N)."""
    gq, sg = _quant(g, -1)                     # [.., N], [.., 1]
    wq, sw = _quant(w, 1)                      # [K, N],  [K, 1]
    dx = jax.lax.dot_general(gq, wq,
                             (((g.ndim - 1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (dx.astype(jnp.float32) * (sg * sw[:, 0][None, :])).astype(g.dtype)


def _int8_dw(x2: jax.Array, g2: jax.Array) -> jax.Array:
    """dw = x.T @ g quantized: [M, K] x [M, N] -> [K, N] (contract M)."""
    xq, sx = _quant(x2, 0)                     # [M, K], [1, K]
    gq, sg = _quant(g2, 0)                     # [M, N], [1, N]
    dw = jax.lax.dot_general(xq, gq,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return dw.astype(jnp.float32) * (sx[0][:, None] * sg)


@jax.custom_vjp
def int8_dot(x: jax.Array, w: jax.Array) -> jax.Array:
    """Quantized x @ w with int8 forward AND backward matmuls."""
    return _int8_matmul(x, w)


def _int8_dot_fwd(x, w):
    return _int8_matmul(x, w), (x, w)


def _int8_dot_bwd(res, g):
    x, w = res
    dx = _int8_dx(g, w)
    xf = x.reshape(-1, x.shape[-1])
    gf = g.reshape(-1, g.shape[-1])
    return dx, _int8_dw(xf, gf).astype(w.dtype)


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)


@jax.custom_vjp
def int8_dot_fwdonly(x: jax.Array, w: jax.Array) -> jax.Array:
    """Quantized forward, EXACT bf16 backward (isolates fwd quantization)."""
    return _int8_matmul(x, w)


def _int8_fo_fwd(x, w):
    return _int8_matmul(x, w), (x, w)


def _int8_fo_bwd(res, g):
    x, w = res
    dx = jax.lax.dot_general(g, w, (((g.ndim - 1,), (1,)), ((), ())))
    xf = x.reshape(-1, x.shape[-1])
    gf = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(xf, gf, (((0,), (0,)), ((), ())))
    return dx.astype(g.dtype), dw.astype(w.dtype)


int8_dot_fwdonly.defvjp(_int8_fo_fwd, _int8_fo_bwd)


class Int8Dense(nn.Module):
    """Drop-in nn.Dense with int8 matmuls.

    Same param names/shapes ("kernel", "bias") as nn.Dense, so presets
    can flip quantization on/off against one checkpoint.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    mode: str = "fwd_bwd"      # "fwd_bwd" | "fwd"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        x = x.astype(self.dtype)
        dot = int8_dot if self.mode == "fwd_bwd" else int8_dot_fwdonly
        y = dot(x, k.astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def dense_cls(quant):
    """nn.Dense or Int8Dense — the encoder picks per the model config.

    `quant`: False -> nn.Dense; True/"fwd_bwd" -> full int8; "fwd" ->
    int8 forward only (bf16 gradients).
    """
    if not quant:
        return nn.Dense
    mode = "fwd" if quant == "fwd" else "fwd_bwd"
    return lambda features, **kw: Int8Dense(features, mode=mode, **kw)
