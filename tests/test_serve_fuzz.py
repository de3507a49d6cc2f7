"""Degenerate-serving-input fuzz: the request path (`ImputationService.
handle_target` -> `Imputer.impute`) must survive the inputs a public
endpoint actually receives — zero-variant targets, targets covering every
reference site, unsorted and duplicated positions, zero-sample cohorts —
and return well-formed probabilities (round-3 VERDICT weak item: the VCF
fuzz covered parsing, not serving inputs; `assemble()` fancy-indexed -1
into a 0-row array on an empty target)."""

import dataclasses

import numpy as np
import jax
import pytest

from rag_snvbert_tpu.infer.imputer import Imputer
from rag_snvbert_tpu.infer.serve import ImputationService
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.io.vcf import VCFData
from rag_snvbert_tpu.models import (BERTFoundationModel, BERTWithEmbeddingRAG,
                                    init_batch)

from tests.test_infer import drop_sites


@pytest.fixture(scope="module")
def setup():
    b = make_bundle(n_train_samples=6, n_ref_samples=16, n_sites=60,
                    n_windows=1, seed=7)
    dims, seq_len = 32, 72
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=dims,
                                n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)
    params = model.init(jax.random.key(0),
                        init_batch(1, seq_len, dims))["params"]

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    imp = Imputer(model, embed_fn, params, b.ref, b.freq,
                  window_len=seq_len - 10, seq_len=seq_len,
                  ref_pad_haps=32, batch_size=4, use_pallas=False)
    return b, imp


def check_result(res, b, n_samp):
    assert res.hap1_prob.shape == (b.ref.n_variants, n_samp)
    assert res.gt_prob.shape == (b.ref.n_variants, n_samp, 4)
    assert ((res.hap1_prob >= 0) & (res.hap1_prob <= 1)).all()
    assert np.isfinite(res.gt_prob).all()
    if n_samp:
        np.testing.assert_allclose(res.gt_prob.sum(-1), 1.0, atol=1e-3)


def empty_target(b, n_samp=3):
    """A target VCF with ZERO variants: every site must be imputed."""
    z = np.zeros(0, object)
    return VCFData(gt=np.zeros((0, n_samp, 2), np.int8),
                   pos=np.zeros(0, np.int64), chrom=z, ref=z, alt=z, ids=z,
                   samples=[f"S{i}" for i in range(n_samp)])


def test_empty_target_all_imputed(setup):
    b, imp = setup
    res = imp.impute(empty_target(b))
    assert res.imputed_flag.all()
    check_result(res, b, 3)


def test_empty_target_progressive(setup):
    b, imp = setup
    res = imp.impute_progressive(empty_target(b), rounds=2)
    assert res.imputed_flag.all()
    check_result(res, b, 3)


def test_all_present_target_passthrough(setup):
    """A target covering EVERY reference site: nothing imputed, observed
    alleles pass through exactly."""
    b, imp = setup
    res = imp.impute(b.train)
    assert not res.imputed_flag.any()
    np.testing.assert_array_equal(res.hap1_prob,
                                  b.train.gt[:, :, 0].astype(np.float32))
    check_result(res, b, b.train.n_samples)


def test_unsorted_positions_match_sorted(setup):
    """searchsorted needs sorted positions; an unsorted serving target must
    be normalized, not silently mis-imputed."""
    b, imp = setup
    rng = np.random.default_rng(3)
    keep = rng.random(b.train.n_variants) > 0.4
    target = drop_sites(b.train, keep)
    perm = rng.permutation(target.n_variants)
    shuffled = dataclasses.replace(
        target, gt=target.gt[perm], pos=target.pos[perm],
        chrom=target.chrom[perm], ref=target.ref[perm],
        alt=target.alt[perm], ids=target.ids[perm])
    r_sorted = imp.impute(target)
    r_shuf = imp.impute(shuffled)
    np.testing.assert_array_equal(r_shuf.imputed_flag, r_sorted.imputed_flag)
    np.testing.assert_array_equal(r_shuf.hap1_prob, r_sorted.hap1_prob)
    np.testing.assert_array_equal(r_shuf.gt_prob, r_sorted.gt_prob)


def test_duplicate_positions_run(setup):
    """Duplicate rows (same position twice, e.g. a multiallelic split):
    the first occurrence wins; the result stays well-formed."""
    b, imp = setup
    rng = np.random.default_rng(4)
    keep = rng.random(b.train.n_variants) > 0.4
    target = drop_sites(b.train, keep)
    dup = dataclasses.replace(
        target,
        gt=np.concatenate([target.gt, target.gt[:5]], axis=0),
        pos=np.concatenate([target.pos, target.pos[:5]]),
        chrom=np.concatenate([target.chrom, target.chrom[:5]]),
        ref=np.concatenate([target.ref, target.ref[:5]]),
        alt=np.concatenate([target.alt, target.alt[:5]]),
        ids=np.concatenate([target.ids, target.ids[:5]]))
    res = imp.impute(dup)
    check_result(res, b, target.n_samples)
    solo = imp.impute(target)
    np.testing.assert_array_equal(res.imputed_flag, solo.imputed_flag)
    np.testing.assert_array_equal(res.hap1_prob, solo.hap1_prob)


def test_service_handles_degenerate_targets(setup):
    """The service seam the HTTP front-end calls: degenerate targets go
    through handle_target without poisoning the resident service."""
    b, imp = setup
    svc = ImputationService(imputer=imp, ref_vcf=b.ref)
    res = svc.handle_target(empty_target(b))
    assert res.imputed_flag.all()
    res = svc.handle_target(b.train)       # all-present
    assert not res.imputed_flag.any()
    rng = np.random.default_rng(5)
    keep = rng.random(b.train.n_variants) > 0.5
    res = svc.handle_target(drop_sites(b.train, keep), rounds=2)
    assert (res.imputed_flag == ~keep).all()


def test_batching_service_degenerate_targets(setup):
    """Degenerate requests through the batching scheduler thread: errors
    (if any) must reach the caller and never wedge the queue."""
    from rag_snvbert_tpu.infer.serve import BatchingImputationService

    b, imp = setup
    with BatchingImputationService(imputer=imp, ref_vcf=b.ref) as svc:
        res = svc.handle_target(empty_target(b))
        assert res.imputed_flag.all()
        res = svc.handle_target(b.train)
        assert not res.imputed_flag.any()
    assert not svc._thread.is_alive()
