"""Distributed index tests on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from rag_snvbert_tpu.index.sharded import ShardedFlatL2Index
from rag_snvbert_tpu.parallel.mesh import make_mesh

from tests.test_index_oracle import assert_topk_match, numpy_l2_topk


def cpu_mesh(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return make_mesh(n_data=1, n_index=n, devices=devs[:n])


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_search_matches_oracle(rng, n_shards):
    mesh = cpu_mesh(n_shards)
    r = rng.standard_normal((1000, 64)).astype(np.float32)
    q = rng.standard_normal((23, 64)).astype(np.float32)
    idx = ShardedFlatL2Index.build(mesh, r)
    vals, ids = idx.search(q, k=10)
    ref_vals, ref_ids = numpy_l2_topk(q, r, 10)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)


def test_sharded_uneven_rows(rng):
    """Row count not divisible by shard count: padding rows must never
    surface."""
    mesh = cpu_mesh(8)
    r = rng.standard_normal((131, 32)).astype(np.float32)  # 131 % 8 != 0
    q = r[:7] + 1e-4  # near-duplicates of real rows
    idx = ShardedFlatL2Index.build(mesh, r)
    vals, ids = idx.search(q, k=5)
    assert (np.asarray(ids) < 131).all()
    ref_vals, ref_ids = numpy_l2_topk(q, r, 5)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_ring_merge_matches_all_gather(rng, n_shards):
    """ppermute ring merge: exact parity with the all_gather merge."""
    mesh = cpu_mesh(n_shards)
    r = rng.standard_normal((500, 48)).astype(np.float32)
    q = rng.standard_normal((17, 48)).astype(np.float32)
    idx = ShardedFlatL2Index.build(mesh, r)
    v_ag, i_ag = idx.search(q, k=7, merge="all_gather")
    v_rg, i_rg = idx.search(q, k=7, merge="ring")
    np.testing.assert_array_equal(np.asarray(i_ag), np.asarray(i_rg))
    np.testing.assert_allclose(np.asarray(v_ag), np.asarray(v_rg))


def test_sharded_packed_matches_plain():
    """Row sharding x planar packing compose: 1/pack HBM per shard with
    identical exact results (both merge strategies)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from rag_snvbert_tpu.index.sharded import ShardedFlatL2Index

    devs = jax.devices("cpu")
    if len(devs) < 4:
        import pytest
        pytest.skip("need 4 cpu devices")
    mesh = Mesh(np.asarray(devs[:4]).reshape(1, 4), ("data", "index"))
    rng = np.random.default_rng(5)
    vecs = rng.integers(0, 2, (403, 130)).astype(np.float32)
    qs = rng.integers(0, 2, (9, 130)).astype(np.float32)
    plain = ShardedFlatL2Index.build(mesh, vecs)
    packed = ShardedFlatL2Index.build(mesh, vecs, pack=8)
    assert packed.vectors.shape[1] * 8 >= 130
    for merge in ("all_gather", "ring"):
        v1, i1 = plain.search(qs, k=5, use_pallas=False, merge=merge)
        v2, i2 = packed.search(qs, k=5, use_pallas=False, merge=merge)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-3)


@pytest.mark.parametrize("merge", ["all_gather", "ring"])
def test_sharded_large_k(rng, merge):
    """k above the kernel's 128-lane cap: per-shard streaming scan +
    ICI merge stays exact on both merge strategies."""
    mesh = cpu_mesh(4)
    r = rng.standard_normal((900, 40)).astype(np.float32)
    q = rng.standard_normal((6, 40)).astype(np.float32)
    idx = ShardedFlatL2Index.build(mesh, r)
    vals, ids = idx.search(q, k=200, merge=merge)
    ref_vals, ref_ids = numpy_l2_topk(q, r, 200)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)
