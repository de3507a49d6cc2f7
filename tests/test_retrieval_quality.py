"""Retrieval quality on structured synthetic panels.

The reference measures retrieval quality as the haplotype-difference rate
between a query and its retrieved neighbour (test_rag_traindataset.py);
here that becomes an assertion: retrieved refs must be closer to the query
than random refs, in both token space and embedding space, and the
window-file Imputer variant must honor explicit windows.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.models import (BERTFoundationModel, BERTWithEmbeddingRAG,
                                    init_batch)
from rag_snvbert_tpu.train.retrieval import (build_token_window_ctx,
                                             encode_window_refs, retrieve,
                                             retrieve_tokens)


def hap_diff_rate(a, b):
    return float((np.asarray(a) != np.asarray(b)).mean())


def test_token_retrieval_beats_random(rng):
    b = make_bundle(n_train_samples=10, n_ref_samples=30, n_sites=200,
                    n_windows=1, seed=9)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=220)
    meta = ds.windows[0]
    toks, af, valid = ds.window_ref_tokens(meta)
    wmask = ds.window_mask(meta, level=2, seed=0)
    ctx = build_token_window_ctx(jnp.asarray(toks), jnp.asarray(wmask),
                                 jnp.asarray(valid))
    batch = ds.make_batch(meta, np.arange(10), level=2, seed=0)
    out = retrieve_tokens({"hap_1": jnp.asarray(batch["hap_1"]),
                           "hap_2": jnp.asarray(batch["hap_2"])},
                          ctx, k=1, use_pallas=False)
    # retrieved neighbour should be far closer than a random reference
    retrieved = np.asarray(out["rag_seg_h1"][:, 0])
    labels = batch["hap_1_label"]
    n = meta.n_sites
    body = slice(1, 1 + n)
    rand = np.asarray(toks)[rng.integers(0, 60, 10)]
    d_ret = hap_diff_rate(retrieved[:, body] - 5, labels[:, body])
    d_rand = hap_diff_rate(rand[:, body] - 5, labels[:, body])
    assert d_ret < d_rand * 0.8, (d_ret, d_rand)


def test_embedding_retrieval_consistency(rng):
    """Embedding-space retrieval of a query identical to a reference
    haplotype must return that haplotype (untrained embeddings are still
    injective enough for exact copies)."""
    b = make_bundle(n_train_samples=4, n_ref_samples=20, n_sites=100,
                    n_windows=1, seed=4)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=120)
    meta = ds.windows[0]
    dims = 16
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=dims,
                                n_layers=1, attn_heads=2)
    model = BERTFoundationModel(bert=bert)
    params = model.init(jax.random.key(0), init_batch(1, 120, dims))["params"]

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    toks, af, valid = ds.window_ref_tokens(meta)
    wmask = ds.window_mask(meta, level=0, seed=0)
    ctx = encode_window_refs(embed_fn, params, jnp.asarray(toks),
                             jnp.asarray(af), jnp.asarray(wmask),
                             valid=jnp.asarray(valid), dtype=jnp.float32)

    # query = masked version of reference hap 3: retrieval must return id 3
    from rag_snvbert_tpu.train.retrieval import apply_token_mask, _search
    q_toks = apply_token_mask(jnp.asarray(toks[3:5]), jnp.asarray(wmask))
    q_emb = embed_fn(params, q_toks,
                     jnp.broadcast_to(jnp.asarray(af)[None], q_toks.shape),
                     True)
    ids = _search(q_emb, ctx, k=1, use_pallas=False)
    assert np.asarray(ids).ravel().tolist() == [3, 4]


def test_imputer_window_file(rng):
    from rag_snvbert_tpu.infer.imputer import Imputer
    from rag_snvbert_tpu.io.windows import Window

    b = make_bundle(n_train_samples=4, n_ref_samples=10, n_sites=90,
                    n_windows=1, seed=6)
    dims, L = 16, 64
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=dims,
                                n_layers=1, attn_heads=2)
    model = BERTFoundationModel(bert=bert)
    params = model.init(jax.random.key(0), init_batch(1, L, dims))["params"]

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    win = Window(np.asarray([[0, 40], [40, 90]]))
    imp = Imputer(model, embed_fn, params, b.ref, b.freq, seq_len=L,
                  ref_pad_haps=32, batch_size=4, use_pallas=False,
                  window=win)
    assert imp.windows == [(0, 40), (40, 90)]
    res = imp.impute(b.train)
    assert res.hap1_prob.shape == (90, 4)
