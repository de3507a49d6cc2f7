"""Gated imputation-quality regression (VERDICT round-1 item 8; rare/common
split round-4 item 3): a stored tiny trained checkpoint imputes the
held-back set of the CALIBRATED synthetic panel (neutral SFS + LD) and
must beat the AF-prior baseline by a clear margin — overall AND in the
rare bin (MAF < 0.05) separately, because rare-variant F1 is the
reference's entire optimization story
(pretrain_with_val_optimized.py:281-310) and an AF prior scores rare F1
= 0 exactly (it never calls a rare alt).  A regression that tanks
rare-variant quality while keeping common-variant accuracy now fails CI.

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


def _hap_f1(calls: np.ndarray, truth: np.ndarray) -> float:
    """F1 with the alt allele as the positive class (the reference's
    cal_pr convention, pretrain_with_val_optimized.py:281-310)."""
    tp = int(((calls == 1) & (truth == 1)).sum())
    fp = int(((calls == 1) & (truth == 0)).sum())
    fn = int(((calls == 0) & (truth == 1)).sum())
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    return 2 * p * r / max(p + r, 1e-9)


@pytest.fixture(scope="module")
def imputed(trained):
    from rag_snvbert_tpu.infer.imputer import Imputer

    b, model, embed_fn, params = trained
    rng = np.random.default_rng(123)
    keep = rng.random(b.train.n_variants) > 0.4
    target = dataclasses.replace(
        b.train, gt=b.train.gt[keep], pos=b.train.pos[keep],
        chrom=b.train.chrom[keep], ref=b.train.ref[keep],
        alt=b.train.alt[keep], ids=b.train.ids[keep])
    imp = Imputer(model, embed_fn, params, b.ref, b.freq,
                  window_len=SEQ_LEN - 8, seq_len=SEQ_LEN, ref_pad_haps=96,
                  batch_size=16, use_pallas=False)
    r = imp.impute(target)
    miss = ~keep
    truth = np.stack([b.train.gt[miss, :, 0], b.train.gt[miss, :, 1]])
    calls = np.stack([(r.hap1_prob[miss] >= 0.5),
                      (r.hap2_prob[miss] >= 0.5)]).astype(np.int8)
    return b, miss, truth, calls


def test_imputation_beats_af_prior(imputed):
    from rag_snvbert_tpu.io.freq import AF

    b, miss, truth, calls = imputed
    acc = (calls == truth).mean()

    af = b.freq.lookup(AF, b.freq.global_idx, b.train.pos[miss])
    prior = (af >= 0.5).astype(np.int8)[None, :, None]
    prior_acc = (np.broadcast_to(prior, truth.shape) == truth).mean()

    # Calibrated on the stored checkpoint: 0.982 model vs 0.824 prior.
    assert acc >= 0.95, f"imputation accuracy regressed: {acc:.4f}"
    assert acc >= prior_acc + 0.10, (
        f"model {acc:.4f} does not clearly beat AF prior {prior_acc:.4f}")


def test_rare_and_common_f1_gates(imputed):
    """Split gates (round-4 VERDICT item 3).  Calibrated on the stored
    checkpoint: hap F1 all 0.950, rare 0.765, common 0.959; AF-prior
    scores rare 0.000 / common 0.078 on the same split.  The rare gate is
    the one that catches a rare-only regression — common accuracy alone
    stays green when rare calls collapse to the prior."""
    from rag_snvbert_tpu.io.freq import AF

    b, miss, truth, calls = imputed
    af = b.freq.lookup(AF, b.freq.global_idx, b.train.pos[miss])
    rare = np.minimum(af, 1 - af) < 0.05
    assert rare.sum() >= 15 and (~rare).sum() >= 30  # split is populated

    rare_f1 = _hap_f1(calls[:, rare], truth[:, rare])
    common_f1 = _hap_f1(calls[:, ~rare], truth[:, ~rare])
    # Thresholds recalibrated after tools/oracle_ceiling.py measured the
    # chr21-scale panel's rare-bin Bayes ceiling (0.9708, round-5): the
    # gate is deterministic (stored ckpt, fixed rng), so 0.70/0.93 keeps
    # <10% headroom under the measured 0.765/0.959 instead of the
    # original 21% band that could hide a real rare-quality regression.
    assert rare_f1 >= 0.70, f"rare-variant F1 regressed: {rare_f1:.4f}"
    assert common_f1 >= 0.93, f"common-variant F1 regressed: {common_f1:.4f}"
