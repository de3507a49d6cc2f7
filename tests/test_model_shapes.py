import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rag_snvbert_tpu.models import (BERT, BERTFoundationModel,
                                    BERTWithEmbeddingRAG, BERTWithRAG)

B, L, D, K, V = 2, 64, 32, 2, 9


def make_batch(rng, with_rag_emb=False, with_rag_seg=False, dims=D):
    x = {
        "hap_1": jnp.asarray(rng.integers(0, V, (B, L))),
        "hap_2": jnp.asarray(rng.integers(0, V, (B, L))),
        "pos": jnp.asarray(rng.random((B, L), dtype=np.float32)),
        "af": jnp.asarray(rng.random((B, L), dtype=np.float32)),
        "af_p": jnp.asarray(rng.random((B, L), dtype=np.float32)),
        "ref": jnp.asarray(rng.random((B, L), dtype=np.float32)),
        "het": jnp.asarray(rng.random((B, L), dtype=np.float32)),
        "hom": jnp.asarray(rng.random((B, L), dtype=np.float32)),
    }
    if with_rag_emb:
        x["rag_emb_h1"] = jnp.asarray(rng.random((B, K, L, dims), dtype=np.float32))
        x["rag_emb_h2"] = jnp.asarray(rng.random((B, K, L, dims), dtype=np.float32))
    if with_rag_seg:
        x["rag_seg_h1"] = jnp.asarray(rng.integers(0, V, (B, K, L)))
        x["rag_seg_h2"] = jnp.asarray(rng.integers(0, V, (B, K, L)))
    return x


def test_bert_forward(rng):
    model = BERT(vocab_size=V, dims=D, n_layers=2, attn_heads=4)
    x = make_batch(rng)
    params = model.init(jax.random.key(0), x)
    h1, h2, h1o, h2o = model.apply(params, x)
    assert h1.shape == (B, L, D) and h2o.shape == (B, L, D)


def test_bert_embedding_rag_forward(rng):
    model = BERTWithEmbeddingRAG(vocab_size=V, dims=D, n_layers=2, attn_heads=4)
    x = make_batch(rng, with_rag_emb=True)
    params = model.init(jax.random.key(0), x)
    h1, h2, _, _ = model.apply(params, x)
    assert h1.shape == (B, L, D)
    # RAG inputs must influence the output
    x2 = dict(x)
    x2["rag_emb_h1"] = x["rag_emb_h1"] + 1.0
    h1b, _, _, _ = model.apply(params, x2)
    assert not np.allclose(np.asarray(h1), np.asarray(h1b))


def test_bert_token_rag_forward(rng):
    model = BERTWithRAG(vocab_size=V, dims=D, n_layers=2, attn_heads=4)
    x = make_batch(rng, with_rag_seg=True)
    params = model.init(jax.random.key(0), x)
    h1, _, _, _ = model.apply(params, x)
    assert h1.shape == (B, L, D)


@pytest.mark.parametrize("compat", [False, True])
def test_foundation_model_outputs(rng, compat):
    bert = BERTWithEmbeddingRAG(vocab_size=V, dims=D, n_layers=2, attn_heads=4)
    model = BERTFoundationModel(bert=bert, compat_double_softmax=compat)
    x = make_batch(rng, with_rag_emb=True)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert len(out) == 7
    assert out[0].shape == (B, L, 2)   # hap_1
    assert out[1].shape == (B, L, 2)
    assert out[2].shape == (B, L, 4)   # gt
    assert out[3].shape == (B, L, D)   # origins
    if compat:
        s = np.asarray(out[0]).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)  # probabilities


def test_dropout_rng_training_mode(rng):
    model = BERT(vocab_size=V, dims=D, n_layers=1, attn_heads=4)
    x = make_batch(rng)
    params = model.init(jax.random.key(0), x)
    a = model.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.key(1)})
    b = model.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_embed_exposed_for_retrieval(rng):
    model = BERTWithEmbeddingRAG(vocab_size=V, dims=D, n_layers=1, attn_heads=4)
    x = make_batch(rng, with_rag_emb=True)
    params = model.init(jax.random.key(0), x)
    toks = x["hap_1"]
    emb = model.apply(params, toks, x["af"], method=model.embed)
    assert emb.shape == (B, L, D)


@pytest.mark.parametrize("flash", [True, "flash", "splash:384f",
                                   "splash:576x384", "splash"])
def test_fused_attention_flag_falls_back_off_tpu(rng, flash):
    """flash/splash presets must run everywhere: off-TPU the module takes
    the XLA einsum path and computes the exact same function, so the
    fused-kernel flag changes nothing but the on-TPU schedule."""
    from rag_snvbert_tpu.models.transformer import MultiHeadAttention

    x = jnp.asarray(rng.standard_normal((2, 16, 32)), jnp.float32)
    kw = dict(heads=4, dims=32, attn_dropout=0.0)
    base = MultiHeadAttention(**kw)
    params = base.init(jax.random.key(0), x)
    fused = MultiHeadAttention(flash=flash, **kw)
    out_base = base.apply(params, x)
    out_fused = fused.apply(params, x)  # same param tree, same math
    np.testing.assert_array_equal(np.asarray(out_base),
                                  np.asarray(out_fused))


def test_splash_kernel_interpret_parity(rng):
    """Splash-kernel smoke in the default (CPU) suite via Pallas interpret
    mode: forward AND backward match the XLA reference at a padded,
    masked shape — kernel regressions surface without hardware
    (the TPU-gated tests cover the compiled kernel)."""
    import jax.numpy as jnp
    from rag_snvbert_tpu.models.transformer import _splash_attention

    b, h, l, hd = 1, 2, 50, 32          # pads to L=128, hd=128 in-kernel
    q = jnp.asarray(rng.standard_normal((b, h, l, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, hd)), jnp.float32)
    scale = hd ** -0.5

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

    def ker(q, k, v):
        return _splash_attention(q, k, v, scale, block=128, interpret=True)

    out_r = ref(q, k, v)
    out_k = ker(q, k, v)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)

    loss_r = lambda *a: (ref(*a) ** 2).sum()
    loss_k = lambda *a: (ker(*a) ** 2).sum()
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    g_k = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_splash_prepadded_valid_len_exact(rng):
    """The Encoder pad-once path (round-4 VERDICT item 3): calling the
    splash kernel with ALREADY-padded q/k/v and valid_len must reproduce
    the unpadded call exactly on valid rows — forward and backward — and
    padded key rows must contribute zero gradient (the static mask
    excludes them from every softmax)."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.models.transformer import _splash_attention

    b, h, l, hd = 1, 2, 50, 128
    lp = 128                              # one 128-block
    q = jnp.asarray(rng.standard_normal((b, h, l, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, hd)), jnp.float32)
    scale = hd ** -0.5

    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, 0)))
    base = _splash_attention(q, k, v, scale, block=128, interpret=True)
    padded = _splash_attention(pad(q), pad(k), pad(v), scale, block=128,
                               interpret=True, valid_len=l)
    assert padded.shape == (b, h, lp, hd)
    np.testing.assert_allclose(np.asarray(padded[:, :, :l]),
                               np.asarray(base), rtol=1e-5, atol=1e-5)

    # gradients through the valid slice match the unpadded call's, and
    # the padded key/value rows receive exactly zero gradient
    loss_b = lambda *a: (_splash_attention(
        *a, scale, block=128, interpret=True) ** 2).sum()
    loss_p = lambda *a: (_splash_attention(
        pad(a[0]), pad(a[1]), pad(a[2]), scale, block=128, interpret=True,
        valid_len=l)[:, :, :l] ** 2).sum()
    g_b = jax.grad(loss_b, argnums=(0, 1, 2))(q, k, v)
    g_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_p, g_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_encoder_splash_pad_once_shape_inert_off_tpu(rng):
    """Encoder with a splash preset still emits [B, L, D] (the pad-once
    residency is sliced back), and off-TPU the flag changes nothing."""
    from rag_snvbert_tpu.models.transformer import Encoder

    x = jnp.asarray(rng.standard_normal((2, 30, 32)), jnp.float32)
    enc = Encoder(n_layers=1, dims=32, attn_heads=4, attn_dropout=0.0,
                  flash="splash:1152x1152f")
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == x.shape
    plain = Encoder(n_layers=1, dims=32, attn_heads=4, attn_dropout=0.0)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(plain.apply(params, x)))
