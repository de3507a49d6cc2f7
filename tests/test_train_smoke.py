"""End-to-end tiny-panel training smoke test (the reference's
test_embedding_rag.py role, but runnable and asserted)."""

import numpy as np
import jax
import pytest

from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.models import (BERTFoundationModel, BERTWithEmbeddingRAG)
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

# Heavy tier: full training loops / multi-device compiles — minutes on
# one core.  The fast inner loop is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    b = make_bundle(n_train_samples=12, n_ref_samples=16, n_sites=120,
                    n_windows=2)
    seq_len = 96
    train_ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                             b.vocab, ref_vcf=b.ref, seq_len=seq_len)
    dims = 32
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=dims,
                                n_layers=2, attn_heads=4)
    model = BERTFoundationModel(bert=bert)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    out = tmp_path_factory.mktemp("run")
    cfg = TrainerConfig(epochs=2, batch_size=6, val_batch_size=6,
                        warmup_steps=20, ref_pad_haps=32,
                        output_dir=str(out), log_freq=1000,
                        curriculum_every=1, patience=10)
    trainer = Trainer(model, embed_fn, train_ds, cfg, val_ds=train_ds)
    return b, trainer, cfg


def test_fit_two_epochs(setup):
    b, trainer, cfg = setup
    result = trainer.fit()
    assert len(result["history"]) == 2
    row = result["history"][-1]
    assert np.isfinite(row["train_loss"])
    assert 0.0 <= row["val_hap_f1"] <= 1.0
    # curriculum advanced (curriculum_every=1)
    assert row["level"] == 1
    # metrics CSV + events written
    import os
    assert os.path.exists(trainer.csv_path)
    assert os.path.exists(trainer.log_path)


def test_checkpoint_roundtrip(setup):
    b, trainer, cfg = setup
    import os
    ckpts = [d for d in os.listdir(cfg.output_dir) if d.startswith("ckpt_ep")]
    assert len(ckpts) >= 2
    step_before = int(trainer.state.step)
    params_before = jax.tree.leaves(trainer.state.params)[0].copy()

    # fresh trainer restoring from the last checkpoint
    t2 = Trainer(trainer.model, trainer.embed_fn, trainer.train_ds, cfg,
                 val_ds=None)
    t2.restore_checkpoint(os.path.join(cfg.output_dir, "ckpt_ep1"))
    assert t2.start_epoch == 2
    assert int(t2.state.step) == step_before
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(t2.state.params)[0]),
        np.asarray(params_before))
    # curriculum level restored
    assert t2.level == trainer.level


def test_best_symlink(setup):
    b, trainer, cfg = setup
    import os
    best = os.path.join(cfg.output_dir, "best")
    assert os.path.islink(best) and os.path.exists(best)


def test_profile_trace_capture(setup, tmp_path):
    """--profile-dir writes a TensorBoard-loadable XLA trace of a few
    steady steps (the tracing endpoint SURVEY section 5 calls for)."""
    import glob
    import os

    b, trainer, _ = setup
    cfg = TrainerConfig(epochs=1, batch_size=6, val_batch_size=6,
                        warmup_steps=20, ref_pad_haps=32,
                        output_dir=str(tmp_path / "run"), log_freq=1000,
                        profile_dir=str(tmp_path / "prof"), profile_steps=2)
    t = Trainer(trainer.model, trainer.embed_fn, trainer.train_ds, cfg)
    t.fit()
    captured = glob.glob(os.path.join(str(tmp_path / "prof"),
                                      "plugins", "profile", "*", "*"))
    assert captured, "no profiler artifacts written"
