"""Fused Pallas kernel parity tests — run against real TPU hardware only
(RAG_SNVBERT_TEST_TPU=1); interpret mode is impractically slow for this
kernel and the XLA oracle path is covered by test_index_oracle."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RAG_SNVBERT_TEST_TPU"),
    reason="set RAG_SNVBERT_TEST_TPU=1 to run Pallas kernel tests on TPU")


def _oracle(q, r, k):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


@pytest.mark.parametrize("b,n,d,k", [
    (8, 256, 128, 4),        # single tile
    (37, 1000, 300, 10),     # unaligned everything
    (64, 2008, 2040, 10),    # genotype-index regime
    (4, 300, 5000, 3),       # d-tiling regime
])
def test_kernel_matches_oracle(b, n, d, k):
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops import l2_ref
    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    r = rng.standard_normal((n, d)).astype(np.float32)
    rn = np.asarray(l2_ref.squared_norms(jnp.asarray(r)))
    vals, ids = l2_topk_pallas(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(rn), k)
    ov, oi = _oracle(q, r, k)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-3, atol=1e-2)
    mism = np.asarray(ids) != oi
    if mism.any():  # id differences only at (near-)ties in distance
        assert np.allclose(np.asarray(vals)[mism], ov[mism],
                           rtol=1e-3, atol=1e-2)


def test_kernel_tie_break_ascending_ids():
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops import l2_ref
    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(1)
    base = rng.integers(0, 2, (4, 256)).astype(np.float32)
    r = np.vstack([base, base])  # exact duplicates
    rn = np.asarray(l2_ref.squared_norms(jnp.asarray(r)))
    _, ids = l2_topk_pallas(jnp.asarray(base), jnp.asarray(r),
                            jnp.asarray(rn), 2)
    assert np.asarray(ids)[:, 0].tolist() == [0, 1, 2, 3]
    assert np.asarray(ids)[:, 1].tolist() == [4, 5, 6, 7]
