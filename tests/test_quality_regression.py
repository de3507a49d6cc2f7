"""Gated imputation-quality regression (VERDICT round-1 item 8): a stored
tiny trained checkpoint imputes the synthetic held-back set and must beat
the AF-prior baseline by a clear margin — the automated version of the
reference's never-tested infer path (src/main/infer.py) and of the round-1
hardware result (0.963 model vs 0.830 AF-prior at full scale).

The checkpoint (tests/assets/quality_ckpt.npz) is regenerated with
tests/make_quality_ckpt.py; this test only loads + infers (~30 s on CPU).
"""

import dataclasses
import os

import numpy as np
import jax
import pytest

from tests.make_quality_ckpt import (BUNDLE_KW, DIMS, SEQ_LEN,
                                     build_model_and_ds)

# Heavy tier: full training loops / multi-device compiles — minutes on
# one core.  The fast inner loop is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow

CKPT = os.path.join(os.path.dirname(__file__), "assets", "quality_ckpt.npz")


@pytest.fixture(scope="module")
def trained():
    from jax.tree_util import keystr, tree_flatten_with_path

    b, ds, model, embed_fn = build_model_and_ds()
    from rag_snvbert_tpu.models import init_batch

    shapes = jax.eval_shape(
        lambda k: model.init(k, init_batch(1, SEQ_LEN, DIMS)),
        jax.random.key(0))["params"]
    z = np.load(CKPT)
    leaves, treedef = tree_flatten_with_path(shapes)
    params = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(z[keystr(path)]) for path, _ in leaves])
    return b, model, embed_fn, params


def test_stored_checkpoint_matches_model_structure(trained):
    b, model, embed_fn, params = trained
    leaf = jax.tree.leaves(params)[0]
    assert leaf.ndim >= 1  # real tensors loaded, not object arrays


def test_imputation_beats_af_prior(trained):
    from rag_snvbert_tpu.infer.imputer import Imputer
    from rag_snvbert_tpu.io.freq import AF

    b, model, embed_fn, params = trained
    rng = np.random.default_rng(123)
    keep = rng.random(b.train.n_variants) > 0.4
    target = dataclasses.replace(
        b.train, gt=b.train.gt[keep], pos=b.train.pos[keep],
        chrom=b.train.chrom[keep], ref=b.train.ref[keep],
        alt=b.train.alt[keep], ids=b.train.ids[keep])

    imp = Imputer(model, embed_fn, params, b.ref, b.freq,
                  window_len=SEQ_LEN - 8, seq_len=SEQ_LEN, ref_pad_haps=64,
                  batch_size=16, use_pallas=False)
    r = imp.impute(target)

    miss = ~keep
    truth1 = b.train.gt[miss, :, 0]
    truth2 = b.train.gt[miss, :, 1]
    calls1 = (r.hap1_prob[miss] >= 0.5).astype(np.int8)
    calls2 = (r.hap2_prob[miss] >= 0.5).astype(np.int8)
    acc = ((calls1 == truth1).mean() + (calls2 == truth2).mean()) / 2

    af = b.freq.lookup(AF, b.freq.global_idx, b.train.pos[miss])
    prior = (af >= 0.5).astype(np.int8)[:, None]
    prior_acc = ((prior == truth1).mean() + (prior == truth2).mean()) / 2

    # Calibrated on the stored checkpoint: 0.921 model vs 0.828 prior.
    assert acc >= 0.90, f"imputation accuracy regressed: {acc:.4f}"
    assert acc >= prior_acc + 0.06, (
        f"model {acc:.4f} does not clearly beat AF prior {prior_acc:.4f}")
