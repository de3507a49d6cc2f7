"""Sharded in-training retrieval on the 8-device CPU mesh: must match the
single-device retrieval exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rag_snvbert_tpu.models import (BERTFoundationModel,
                                    BERTWithEmbeddingRAG, init_batch)
from rag_snvbert_tpu.parallel.mesh import make_mesh
from rag_snvbert_tpu.train.retrieval import encode_window_refs, retrieve
from rag_snvbert_tpu.train.sharded_retrieval import (
    ShardedWindowRefContext, encode_window_refs_sharded, retrieve_sharded)

# Heavy tier: full training loops / multi-device compiles — minutes on
# one core.  The fast inner loop is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = make_mesh(n_data=1, n_index=8, devices=devs[:8])

    B, L, D, N, V = 4, 48, 16, 37, 9  # N deliberately not divisible by 8
    rng = np.random.default_rng(0)
    bert = BERTWithEmbeddingRAG(vocab_size=V, dims=D, n_layers=1,
                                attn_heads=2)
    model = BERTFoundationModel(bert=bert)
    params = model.init(jax.random.key(0), init_batch(1, L, D))["params"]

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    ref_tokens = jnp.asarray(rng.integers(5, 7, (N, L)), jnp.int32)
    ref_af = jnp.asarray(rng.random(L, dtype=np.float32))
    wmask = jnp.asarray(np.r_[0, rng.integers(0, 2, L - 1)], jnp.int32)
    batch = {
        "hap_1": jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32),
        "hap_2": jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32),
        "af": jnp.asarray(rng.random((B, L), dtype=np.float32)),
    }
    return mesh, model, embed_fn, params, ref_tokens, ref_af, wmask, batch


def test_sharded_ctx_matches_replicated(setup):
    mesh, model, embed_fn, params, ref_tokens, ref_af, wmask, batch = setup
    sctx = encode_window_refs_sharded(embed_fn, params, ref_tokens, ref_af,
                                      wmask, mesh, dtype=jnp.float32)
    ctx = encode_window_refs(embed_fn, params, ref_tokens, ref_af, wmask,
                             dtype=jnp.float32)
    n = ref_tokens.shape[0]
    np.testing.assert_allclose(
        np.asarray(sctx.ref_emb_flat)[:n],
        np.asarray(ctx.ref_emb_search).reshape(n, -1), rtol=1e-5, atol=1e-5)
    # padding rows tombstoned
    assert np.isinf(np.asarray(sctx.ref_norms)[n:]).all()


def test_sharded_retrieval_matches_single_device(setup):
    mesh, model, embed_fn, params, ref_tokens, ref_af, wmask, batch = setup
    sctx = encode_window_refs_sharded(embed_fn, params, ref_tokens, ref_af,
                                      wmask, mesh, dtype=jnp.float32)
    ctx = encode_window_refs(embed_fn, params, ref_tokens, ref_af, wmask,
                             dtype=jnp.float32)
    out_s = retrieve_sharded(embed_fn, params, batch, sctx, mesh, k=2)
    out_r = retrieve(embed_fn, params, batch, ctx, k=2, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_s["rag_emb_h1"]),
                               np.asarray(out_r["rag_emb_h1"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s["rag_emb_h2"]),
                               np.asarray(out_r["rag_emb_h2"]),
                               rtol=1e-5, atol=1e-5)


def test_sharded_retrieval_gradients_flow(setup):
    mesh, model, embed_fn, params, ref_tokens, ref_af, wmask, batch = setup
    sctx = encode_window_refs_sharded(embed_fn, params, ref_tokens, ref_af,
                                      wmask, mesh, dtype=jnp.float32)

    def loss(p):
        out = retrieve_sharded(embed_fn, p, batch, sctx, mesh, k=1)
        return (out["rag_emb_h1"].astype(jnp.float32).sum()
                + out["rag_emb_h2"].astype(jnp.float32).sum())

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert total > 0.0  # grads reach the embedding params via re-embedding


def test_ring_merge_retrieval_matches(setup):
    mesh, model, embed_fn, params, ref_tokens, ref_af, wmask, batch = setup
    sctx = encode_window_refs_sharded(embed_fn, params, ref_tokens, ref_af,
                                      wmask, mesh, dtype=jnp.float32)
    out_ag = retrieve_sharded(embed_fn, params, batch, sctx, mesh, k=2)
    out_rg = retrieve_sharded(embed_fn, params, batch, sctx, mesh, k=2,
                              merge="ring")
    np.testing.assert_allclose(np.asarray(out_ag["rag_emb_h1"]),
                               np.asarray(out_rg["rag_emb_h1"]))


def test_retrieve_sharded_inside_jit(setup):
    """retrieve_sharded must compose with a surrounding jit (the train
    step calls it from inside one)."""
    mesh, model, embed_fn, params, ref_tokens, ref_af, wmask, batch = setup
    sctx = encode_window_refs_sharded(embed_fn, params, ref_tokens, ref_af,
                                      wmask, mesh, dtype=jnp.float32)

    @jax.jit
    def run(p, b, c):
        out = retrieve_sharded(embed_fn, p, b, c, mesh, k=2, data_axis=None)
        return out["rag_emb_h1"]

    eager = retrieve_sharded(embed_fn, params, batch, sctx, mesh,
                             k=2)["rag_emb_h1"]
    np.testing.assert_allclose(np.asarray(run(params, batch, sctx)),
                               np.asarray(eager), rtol=1e-5, atol=1e-5)
