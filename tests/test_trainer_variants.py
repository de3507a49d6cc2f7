"""Trainer variants: V17 token-space mode end to end, recon loss, no-RAG."""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.models import (BERT, BERTFoundationModel, BERTWithRAG)
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig


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
