"""int8 quantized encoder matmuls (ops/quant): accuracy envelope,
gradient flow, param-tree compatibility with nn.Dense, and an end-to-end
quantized train step that still learns."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from rag_snvbert_tpu.ops.quant import Int8Dense, int8_dot


def test_int8_dot_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 48)), jnp.float32)
    y = int8_dot(x, w)
    ref = x @ w
    # int8 with per-row/per-col scales: relative error ~ 1/127 per term
    err = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert err < 0.03, err


def test_int8_dot_grads_flow_and_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)

    def loss_q(x, w):
        return (int8_dot(x, w) ** 2).sum()

    def loss_f(x, w):
        return ((x @ w) ** 2).sum()

    gq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for a, b in zip(gq, gf):
        cos = float((a * b).sum()
                    / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
        assert cos > 0.99, cos


def test_int8_dense_param_tree_matches_dense():
    x = jnp.ones((2, 8, 24))
    pq = Int8Dense(16).init(jax.random.key(0), x)["params"]
    pd = nn.Dense(16).init(jax.random.key(0), x)["params"]
    assert set(pq) == set(pd) == {"kernel", "bias"}
    assert pq["kernel"].shape == pd["kernel"].shape
    out = Int8Dense(16).apply({"params": pq}, x)
    assert out.shape == (2, 8, 16)


def test_int8_dot_3d_batch():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 10, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 12)), jnp.float32)
    y = int8_dot(x, w)
    assert y.shape == (4, 10, 12)
    err = float(jnp.abs(y - x @ w).max() / jnp.abs(x @ w).max())
    assert err < 0.04, err


def test_quantized_model_trains():
    """A tiny quantized encoder still fits a fixed batch (loss decreases)
    and its param tree matches the unquantized model's exactly."""
    from rag_snvbert_tpu.config import ModelConfig, RunConfig
    import dataclasses
    import optax

    mk = lambda q: dataclasses.replace(
        RunConfig(), model=ModelConfig(dims=32, n_layers=1, attn_heads=4,
                                       seq_len=40, rag_mode="none",
                                       int8_matmuls=q))
    from rag_snvbert_tpu.models import init_batch

    ib = init_batch(2, 40, 32)
    mq = mk(True).build_model(9)
    mf = mk(False).build_model(9)
    pq = mq.init(jax.random.key(0), ib)["params"]
    pf = mf.init(jax.random.key(0), ib)["params"]
    assert jax.tree.structure(pq) == jax.tree.structure(pf)

    tx = optax.adam(3e-3)
    opt = tx.init(pq)

    def loss_fn(p):
        out = mq.apply({"params": p}, ib, deterministic=True)
        h1 = out[0]
        lbl = jnp.zeros(ib["hap_1"].shape, jnp.int32)
        return optax.softmax_cross_entropy_with_integer_labels(
            h1, lbl).mean()

    @jax.jit
    def step(p, opt):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, l

    losses = []
    p = pq
    for _ in range(30):
        p, opt, l = step(p, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
