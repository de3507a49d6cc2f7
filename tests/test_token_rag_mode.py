"""V17 token-space RAG mode: context build, retrieval, and a train step
through BERTWithRAG."""

import numpy as np
import jax
import jax.numpy as jnp

from rag_snvbert_tpu.io.vocab import MASK
from rag_snvbert_tpu.models import (BERTFoundationModel, BERTWithRAG,
                                    init_batch)
from rag_snvbert_tpu.train.retrieval import (build_token_window_ctx,
                                             retrieve_tokens)
from rag_snvbert_tpu.train.schedule import make_optimizer
from rag_snvbert_tpu.train.step import StepConfig, TrainState, train_step
import pytest

# Heavy tier: full training loops / multi-device compiles — minutes on
# one core.  The fast inner loop is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow



def test_token_ctx_and_retrieval(rng):
    N, L = 32, 48
    ref = jnp.asarray(rng.integers(5, 7, (N, L)), jnp.int32)
    wmask = jnp.asarray(np.r_[0, rng.integers(0, 2, L - 1)], jnp.int32)
    ctx = build_token_window_ctx(ref, wmask)
    # masked positions replaced on search side, complete side untouched
    assert (np.asarray(ctx.ref_tokens_masked)[:, np.asarray(wmask) == 1]
            == MASK).all()
    assert (np.asarray(ctx.ref_tokens) == np.asarray(ref)).all()

    # a query equal to a masked ref must retrieve that ref first
    q = ctx.ref_tokens_masked[3:5]
    batch = {"hap_1": q, "hap_2": ctx.ref_tokens_masked[7:9]}
    out = retrieve_tokens(batch, ctx, k=2, use_pallas=False)
    assert out["rag_seg_h1"].shape == (2, 2, L)
    assert int(out["rag_seg_h1"][0, 0, 5]) == int(ref[3, 5])
    # retrieved segments are the complete (unmasked) tokens
    assert (np.asarray(out["rag_seg_h1"]) != MASK).all()


def test_token_mode_train_step(rng):
    B, L, D, N, V = 2, 48, 32, 16, 9
    bert = BERTWithRAG(vocab_size=V, dims=D, n_layers=2, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    params = model.init(jax.random.key(0),
                        init_batch(1, L, D, with_rag_emb=False,
                                   with_rag_seg=True))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(warmup_steps=10))

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    ref = jnp.asarray(rng.integers(5, 7, (N, L)), jnp.int32)
    wmask = jnp.asarray(np.r_[0, rng.integers(0, 2, L - 1)], jnp.int32)
    ctx = build_token_window_ctx(ref, wmask)

    zi = lambda: jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    zf = lambda: jnp.asarray(rng.random((B, L), dtype=np.float32))
    batch = {"hap_1": zi(), "hap_2": zi(),
             "hap_1_label": jnp.asarray(rng.integers(0, 2, (B, L))),
             "hap_2_label": jnp.asarray(rng.integers(0, 2, (B, L))),
             "gt_label": jnp.asarray(rng.integers(0, 4, (B, L))),
             "mask": jnp.asarray(rng.integers(0, 2, (B, L)), jnp.int32),
             "pos": zf(), "af": zf(), "af_p": zf(), "ref": zf(),
             "het": zf(), "hom": zf()}
    cfg = StepConfig(use_pallas=False, rag_k=2)
    # snapshot before the step: train_step donates its input state
    before = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state2, stats = train_step(state, batch, ctx, jax.random.key(1),
                               embed_fn, cfg)
    assert np.isfinite(float(stats["loss"]))
    after = np.asarray(jax.tree.leaves(state2.params)[0])
    assert not np.allclose(before, after)
