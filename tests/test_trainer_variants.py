"""Trainer variants: V17 token-space mode end to end, recon loss, no-RAG."""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.models import (BERT, BERTFoundationModel, BERTWithRAG)
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

# Heavy tier: full training loops / multi-device compiles — minutes on
# one core.  The fast inner loop is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow



def make_ds(seq_len=80):
    b = make_bundle(n_train_samples=8, n_ref_samples=10, n_sites=96,
                    n_windows=2, seed=13)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=seq_len)
    return b, ds


def embed_fn_for(model):
    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)
    return embed_fn


def test_token_mode_trainer(tmp_path):
    b, ds = make_ds()
    bert = BERTWithRAG(vocab_size=b.vocab.size, dims=32, n_layers=1,
                       attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    cfg = TrainerConfig(epochs=1, batch_size=4, warmup_steps=5,
                        ref_pad_haps=32, rag_mode="token",
                        output_dir=str(tmp_path), log_freq=1000)
    t = Trainer(model, embed_fn_for(model), ds, cfg)
    res = t.fit()
    assert np.isfinite(res["history"][0]["train_loss"])


def test_no_rag_trainer_with_recon(tmp_path):
    b, ds = make_ds()
    bert = BERT(vocab_size=b.vocab.size, dims=32, n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    cfg = TrainerConfig(epochs=1, batch_size=4, warmup_steps=5,
                        rag_mode="none", use_recon_loss=True,
                        output_dir=str(tmp_path), log_freq=1000)
    t = Trainer(model, embed_fn_for(model), ds, cfg)
    res = t.fit()
    assert np.isfinite(res["history"][0]["train_loss"])


def test_prefetch_off_matches_on(tmp_path):
    """Context prefetch must not change the training result when params
    are frozen per window (1 batch per window -> no staleness at all)."""
    b, ds = make_ds()
    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG

    def build(prefetch, out):
        bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                    n_layers=1, attn_heads=4)
        model = BERTFoundationModel(bert=bert)
        cfg = TrainerConfig(epochs=1, batch_size=8, warmup_steps=5,
                            ref_pad_haps=32, prefetch_ctx=prefetch,
                            output_dir=str(out), log_freq=1000)
        return Trainer(model, embed_fn_for(model), ds, cfg)

    t_on = build(True, tmp_path / "on")
    t_off = build(False, tmp_path / "off")
    r_on = t_on.fit()
    r_off = t_off.fit()
    assert abs(r_on["history"][0]["train_loss"]
               - r_off["history"][0]["train_loss"]) < 1e-3


def test_adaptive_mask_schedule(tmp_path):
    """Continuous AdaptiveMaskScheduler (reference pretrain.py:21-36) as a
    TrainerConfig option."""
    from rag_snvbert_tpu.data import masking
    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG

    b, ds = make_ds()
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    cfg = TrainerConfig(epochs=2, batch_size=8, warmup_steps=5,
                        ref_pad_haps=32, mask_schedule="cosine",
                        output_dir=str(tmp_path), log_freq=1000)
    t = Trainer(model, embed_fn_for(model), ds, cfg)
    res = t.fit()
    assert len(res["history"]) == 2
    assert all(np.isfinite(r["train_loss"]) for r in res["history"])
    # the schedule itself ramps monotonically
    rates = [masking.adaptive_mask_ratio(e, 10) for e in range(10)]
    assert rates == sorted(rates) and rates[0] == 0.15 and rates[-1] == 0.8


def test_single_cohort_sample_split(tmp_path):
    """val_sample_ids without a val_ds: validation runs on the training
    cohort restricted to the held-out samples (scripts/split_data.py)."""
    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG

    b, ds = make_ds()
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    cfg = TrainerConfig(epochs=1, batch_size=4, val_batch_size=4,
                        warmup_steps=5, ref_pad_haps=32,
                        output_dir=str(tmp_path), log_freq=1000)
    tr_ids, va_ids = np.arange(6), np.arange(6, 8)
    t = Trainer(model, embed_fn_for(model), ds, cfg,
                train_sample_ids=tr_ids, val_sample_ids=va_ids)
    assert t.has_validation
    res = t.fit()
    row = res["history"][0]
    assert "val_loss" in row and np.isfinite(row["val_loss"])
    # 6 train samples @ bs 4 -> 2 batches per window x 2 windows
    assert row["train_n_batches"] == 4
    assert row["val_n_batches"] == 2


def test_checkpoint_gc_keeps_newest_and_best(tmp_path):
    """keep_checkpoints bounds disk usage; best symlink target survives."""
    import os

    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG

    b, ds = make_ds()
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    cfg = TrainerConfig(epochs=3, batch_size=8, warmup_steps=5,
                        ref_pad_haps=32, keep_checkpoints=1,
                        output_dir=str(tmp_path), log_freq=1000)
    t = Trainer(model, embed_fn_for(model), ds, cfg)
    t.fit()
    kept = sorted(n for n in os.listdir(tmp_path) if n.startswith("ckpt_ep"))
    best = os.path.realpath(os.path.join(tmp_path, "best")) \
        if os.path.islink(os.path.join(tmp_path, "best")) else None
    assert "ckpt_ep2" in kept            # newest always kept
    assert len(kept) <= 2                # newest + (possibly) best
    if best is not None:
        assert os.path.exists(best)


def test_steps_per_dispatch_matches_per_step(tmp_path):
    """Multi-step dispatch (lax.scan over stacked batches) must reproduce
    per-step training: same batch order, same per-step dropout fold-in,
    same optimizer updates, same epoch metrics.  Chunk size 3 over 2
    batches/window also exercises the short trailing chunk."""
    import jax

    b, ds = make_ds()
    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG

    def run(k, out):
        bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                    n_layers=1, attn_heads=4)
        model = BERTFoundationModel(bert=bert)
        cfg = TrainerConfig(epochs=2, batch_size=4, warmup_steps=5,
                            ref_pad_haps=32, steps_per_dispatch=k,
                            output_dir=str(out), log_freq=1000)
        t = Trainer(model, embed_fn_for(model), ds, cfg, val_ds=ds)
        return t.fit(), t

    r1, t1 = run(1, tmp_path / "k1")
    r3, t3 = run(3, tmp_path / "k3")
    for a, bb in zip(r1["history"], r3["history"]):
        assert a["train_n_batches"] == bb["train_n_batches"]
        np.testing.assert_allclose(a["train_loss"], bb["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(a["val_hap_f1"], bb["val_hap_f1"],
                                   rtol=1e-5)
    p1 = jax.tree.leaves(t1.state.params)[0]
    p3 = jax.tree.leaves(t3.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p3),
                               rtol=2e-4, atol=2e-5)


def test_steps_per_dispatch_multi_pop_cohort(tmp_path):
    """Regression (round-2 VERDICT confirmed bug): with a multi-population
    cohort whose batches differ in population composition (10 samples,
    batch 4 -> the trailing batch has a different pop set), packed
    feat_rows must stay shape-stable so _chunk_batches can stack them and
    a single jitted step serves every batch."""
    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG

    b = make_bundle(n_train_samples=10, n_ref_samples=10, n_sites=96,
                    n_windows=2, n_pops=3, seed=7)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=80)
    # every batch of any sample subset carries the full static class set
    shapes = {ds.make_batch(m, ids, level=0, seed=0, pad_to=4,
                            packed=True)["feat_rows"].shape
              for m in ds.windows
              for ids in (np.arange(4), np.arange(4, 8), np.arange(8, 10))}
    assert shapes == {(3, 80, 4)}

    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    cfg = TrainerConfig(epochs=1, batch_size=4, warmup_steps=5,
                        ref_pad_haps=32, steps_per_dispatch=3,
                        output_dir=str(tmp_path), log_freq=1000)
    t = Trainer(model, embed_fn_for(model), ds, cfg)
    res = t.fit()
    assert np.isfinite(res["history"][0]["train_loss"])
    # 10 samples @ bs 4 -> 3 batches/window x 2 windows
    assert res["history"][0]["train_n_batches"] == 6
