"""Regenerate tests/assets/quality_ckpt.npz (the stored tiny checkpoint for
test_quality_regression.py).

Trains the tiny flagship-architecture model on the fixed synthetic bundle
for 30 epochs (~3 min on CPU) and saves the params as an npz keyed by
jax.tree_util.keystr paths.  Run manually when the model architecture or
synthetic generator changes:

    python tests/make_quality_ckpt.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

# Shared fixture constants (test_quality_regression.py must match).
# The bundle is the CALIBRATED generator (round-4 VERDICT item 2): a
# rare-heavy neutral SFS + real LD, so the rare/common F1 split — the
# reference's headline metric — is measurable and gated.  mean_gap_bp is
# widened so the 240-site toy span still covers several LD blocks.
SEED = 7
BUNDLE_KW = dict(n_train_samples=24, n_ref_samples=48, n_sites=240,
                 n_windows=2, n_founders=48, mean_gap_bp=400, seed=SEED)
SEQ_LEN = 128
DIMS, LAYERS, HEADS = 64, 2, 4


def build_model_and_ds():
    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_calibrated_bundle
    from rag_snvbert_tpu.models import (BERTFoundationModel,
                                        BERTWithEmbeddingRAG)

    b = make_calibrated_bundle(**BUNDLE_KW)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=SEQ_LEN)
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=DIMS,
                                n_layers=LAYERS, attn_heads=HEADS)
    model = BERTFoundationModel(bert=bert)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    return b, ds, model, embed_fn


def main():
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass
    from jax.tree_util import keystr, tree_flatten_with_path

    from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

    b, ds, model, embed_fn = build_model_and_ds()
    cfg = TrainerConfig(epochs=30, batch_size=16, warmup_steps=30,
                        max_lr=1.5e-3, init_lr=1e-4, ref_pad_haps=64,
                        curriculum_every=6, output_dir="/tmp/quality_run",
                        log_freq=10000, seed=SEED, keep_checkpoints=1)
    tr = Trainer(model, embed_fn, ds, cfg)
    tr.fit()

    leaves, _ = tree_flatten_with_path(tr.state.params)
    out = {keystr(path): np.asarray(v) for path, v in leaves}
    dest = os.path.join(os.path.dirname(__file__), "assets",
                        "quality_ckpt.npz")
    np.savez_compressed(dest, **out)
    print(f"saved {len(out)} tensors to {dest}")


if __name__ == "__main__":
    sys.exit(main())
