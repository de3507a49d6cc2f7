"""Oracle tests: index search vs brute-force numpy exact L2/Hamming.

This is the recall-parity check the reference never had (BASELINE.md):
flat search is exact, so recall@k must be 1.0 up to distance ties.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_snvbert_tpu.index import FlatL2Index, HammingIndex
from rag_snvbert_tpu.ops import l2_ref


def numpy_l2_topk(q, r, k):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


def assert_topk_match(vals, ids, ref_vals, ref_ids, tol=1e-3):
    """Values must match; ids may differ only where distances tie."""
    np.testing.assert_allclose(vals, ref_vals, rtol=tol, atol=tol)
    mismatch = ids != ref_ids
    if mismatch.any():
        # any id mismatch must be a (near-)tie in distance
        assert np.allclose(vals[mismatch], ref_vals[mismatch], atol=tol)


def test_flat_l2_exact_recall(rng):
    q = rng.standard_normal((37, 96)).astype(np.float32)
    r = rng.standard_normal((211, 96)).astype(np.float32)
    idx = FlatL2Index.build(r)
    vals, ids = idx.search(q, k=10)
    ref_vals, ref_ids = numpy_l2_topk(q, r, 10)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)


def test_flat_l2_haplotype_vectors(rng):
    # Genotype index regime: 0/1 vectors, d = win_len*2 (build_ref_db_l2.py)
    r = rng.integers(0, 2, (500, 2040)).astype(np.float32)
    q = rng.integers(0, 2, (16, 2040)).astype(np.float32)
    idx = FlatL2Index.build(r)
    vals, ids = idx.search(q, k=8)
    ref_vals, ref_ids = numpy_l2_topk(q, r, 8)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)


def test_masked_search_matches_column_drop(rng):
    """masked_search == rebuilding an index on unmasked columns
    (the partial_faiss_intersect.py semantics)."""
    r = rng.standard_normal((300, 128)).astype(np.float32)
    q = rng.standard_normal((9, 128)).astype(np.float32)
    keep = rng.integers(0, 2, 128).astype(np.float32)
    idx = FlatL2Index.build(r)
    vals, ids = idx.masked_search(q, jnp.asarray(keep), k=5)
    cols = np.flatnonzero(keep)
    ref_vals, ref_ids = numpy_l2_topk(q[:, cols], r[:, cols], 5)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)


def test_tombstone_rows_never_retrieved(rng):
    r = rng.standard_normal((64, 32)).astype(np.float32)
    idx = FlatL2Index.build(r)
    # tombstone rows 0..9 by setting +inf norms
    idx = idx.replace(norms=idx.norms.at[:10].set(np.inf))
    q = r[:5]  # exact copies of tombstoned rows
    _, ids = idx.search(q, k=3)
    assert (np.asarray(ids) >= 10).all()


def test_hamming_index(rng):
    r = rng.integers(0, 2, (200, 77))
    q = rng.integers(0, 2, (11, 77))
    idx = HammingIndex.build(r)
    vals, ids = idx.search(jnp.asarray(q), k=4)
    d = (q[:, None, :] != r[None, :, :]).sum(-1)
    ref_ids = np.argsort(d, axis=1, kind="stable")[:, :4]
    ref_vals = np.take_along_axis(d, ref_ids, axis=1)
    assert (np.asarray(vals) == ref_vals).all()
    mismatch = np.asarray(ids) != ref_ids
    assert np.asarray(vals)[mismatch].size == 0 or (
        np.asarray(vals)[mismatch] == ref_vals[mismatch]).all()


def test_save_load_roundtrip(tmp_path, rng):
    r = rng.standard_normal((50, 16)).astype(np.float32)
    idx = FlatL2Index.build(r)
    p = str(tmp_path / "w0.npz")
    idx.save(p)
    idx2 = FlatL2Index.load(p)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    v1, i1 = idx.search(q, 3)
    v2, i2 = idx2.search(q, 3)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))


def test_pack_bits_roundtrip_popcount(rng):
    x = rng.integers(0, 2, (5, 100))
    packed = l2_ref.pack_bits(jnp.asarray(x))
    import jax
    total = np.asarray(jax.lax.population_count(packed)).sum()
    assert total == x.sum()


def test_pack_bits_np_matches_device(rng):
    """Host packing (offline builds; avoids the chromosome-scale HBM OOM
    of the device expand) must produce bit-identical words, including
    non-multiple-of-32 widths."""
    for d in (100, 128, 2040, 33):
        x = rng.integers(0, 2, (7, d))
        np.testing.assert_array_equal(
            l2_ref.pack_bits_np(x),
            np.asarray(l2_ref.pack_bits(jnp.asarray(x))))


def test_hamming_streaming_matches_direct(rng):
    """Streaming Hamming scan (bounded memory) must reproduce the direct
    [B, N, words] path exactly, including uneven chunking and tombstones."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.index.flat import HammingIndex

    bits = rng.integers(0, 2, (1003, 130)).astype(np.int8)  # 1003 % 256 != 0
    q = rng.integers(0, 2, (9, 130)).astype(np.int8)
    idx = HammingIndex.build(bits)
    idx = idx.replace(valid=idx.valid.at[50:60].set(False))
    dv, di = idx.search(jnp.asarray(q), k=7, streaming=False)
    sv, si = idx.search(jnp.asarray(q), k=7, streaming=True, chunk=256)
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(sv))
    np.testing.assert_array_equal(np.asarray(di), np.asarray(si))
    assert not np.isin(np.asarray(si), np.arange(50, 60)).any()


def test_aligned_build_matches_unaligned(rng, tmp_path):
    """align=True pads storage to the kernel tile multiples (n to 512,
    d to the d-tile) without changing any search result, the logical
    ntotal/d, or the save/load round trip."""
    r = rng.standard_normal((300, 130)).astype(np.float32)
    q = rng.standard_normal((9, 130)).astype(np.float32)
    plain = FlatL2Index.build(r)
    aligned = FlatL2Index.build(r, align=True)
    assert aligned.vectors.shape[0] % 512 == 0
    assert aligned.vectors.shape[1] % 128 == 0
    assert (aligned.ntotal, aligned.d) == (plain.ntotal, plain.d) == (300, 130)
    for kw in ({}, {"approx": True}):
        v1, i1 = plain.search(q, 5, **kw)
        v2, i2 = aligned.search(q, 5, **kw)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-5, atol=1e-4)
    # padded rows can never be retrieved
    assert (np.asarray(aligned.search(q, 5)[1]) < 300).all()

    keep = rng.integers(0, 2, 130).astype(np.float32)
    v1, i1 = plain.masked_search(q, jnp.asarray(keep), k=5)
    v2, i2 = aligned.masked_search(q, jnp.asarray(keep), k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-4)

    path = str(tmp_path / "aligned.idx")
    aligned.save(path)
    back = FlatL2Index.load(path)
    assert (back.ntotal, back.d) == (300, 130)
    v3, i3 = back.search(q, 5)
    np.testing.assert_array_equal(np.asarray(aligned.search(q, 5)[1]),
                                  np.asarray(i3))


def test_int8_build_rejects_values_that_double_wrap(rng):
    """The fused kernel pre-doubles queries in the storage dtype, so
    int8 storage only admits |v| <= 63 (int4: |v| <= 3); build() checks
    once at index-build time."""
    ok = rng.integers(0, 2, (64, 40)).astype(np.int8)
    FlatL2Index.build(ok, dtype=jnp.int8)  # genotypes: fine
    bad = ok.copy()
    bad[3, 7] = 64
    with pytest.raises(ValueError, match="wrap"):
        FlatL2Index.build(bad, dtype=jnp.int8)
    with pytest.raises(ValueError, match="wrap"):
        FlatL2Index.build(np.full((8, 16), 4, np.int8), dtype=jnp.int4)


def test_token_ctx_large_ids_fall_back_to_f32():
    """Token ids > 63 would wrap under the kernel's int8 pre-doubling:
    the ctx records it and retrieve_tokens routes to the exact f32
    path."""
    from rag_snvbert_tpu.train.retrieval import (build_token_window_ctx,
                                                 retrieve_tokens)

    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.integers(1, 60, (32, 24)).astype(np.int32))
    big = jnp.asarray(rng.integers(1, 200, (32, 24)).astype(np.int32))
    wmask = jnp.zeros((24,), bool)  # nothing masked: index == raw tokens
    assert build_token_window_ctx(small, wmask).ids_fit_int8
    ctx = build_token_window_ctx(big, wmask)
    assert not ctx.ids_fit_int8
    batch = {"hap_1": big[:4], "hap_2": big[4:8]}
    out = retrieve_tokens(batch, ctx, k=2)  # must not take the int8 path
    assert out["rag_seg_h1"].shape == (4, 2, 24)
    # exact-oracle check: with an unmasked index, the nearest neighbor
    # of a reference vector is itself
    self_batch = {"hap_1": big[:4], "hap_2": big[:4]}
    out2 = retrieve_tokens(self_batch, ctx, k=1)
    np.testing.assert_array_equal(np.asarray(out2["rag_seg_h1"][:, 0]),
                                  np.asarray(big[:4]))


@pytest.mark.parametrize("pack,hi", [(8, 2), (4, 4), (2, 8)])
def test_packed_index_matches_plain(rng, tmp_path, pack, hi):
    """Planar-packed storage (1/pack HBM): search, masked_search, build
    alignment, and save/load all agree with the unpacked index."""
    r = rng.integers(0, hi, (300, 130)).astype(np.int8)
    q = rng.integers(0, hi, (9, 130)).astype(np.int8)
    plain = FlatL2Index.build(r.astype(np.float32))
    packed = FlatL2Index.build(r, pack=pack, align=True)
    assert packed.ntotal == 300 and packed.d == 130
    assert packed.vectors.shape[1] * pack >= 130  # 1/pack the bytes

    v1, i1 = plain.search(jnp.asarray(q, jnp.float32), 5)
    v2, i2 = packed.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)
    assert (np.asarray(i2) < 300).all()  # padded rows never retrieved

    keep = rng.integers(0, 2, 130).astype(np.float32)
    v3, i3 = plain.masked_search(jnp.asarray(q, jnp.float32),
                                 jnp.asarray(keep), k=5)
    v4, i4 = packed.masked_search(q, jnp.asarray(keep), k=5)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v4), atol=1e-3)

    path = str(tmp_path / f"packed{pack}.idx")
    packed.save(path)
    back = FlatL2Index.load(path)
    assert back.pack == pack and (back.ntotal, back.d) == (300, 130)
    v5, i5 = back.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i5))


def test_packed_build_rejects_out_of_range(rng):
    bad = rng.integers(0, 3, (32, 40)).astype(np.int8)  # 2 >= 2^1
    with pytest.raises(ValueError, match="admits values"):
        FlatL2Index.build(bad, pack=8)


def test_large_k_streaming_matches_oracle(rng):
    """k above the kernel's 128-lane cap must route to the streaming XLA
    path on EVERY storage mode and stay exact (FAISS takes arbitrary k,
    reference build_ref_db_l2.py:89-93; the kernel asserts k <= 128)."""
    k = 256
    r = rng.integers(0, 2, (700, 130)).astype(np.float32)
    q = rng.integers(0, 2, (7, 130)).astype(np.float32)
    ref_vals, ref_ids = numpy_l2_topk(q, r, k)

    for idx in (FlatL2Index.build(r),
                FlatL2Index.build(r, align=True),
                FlatL2Index.build(r.astype(np.int8), pack=8),
                FlatL2Index.build(r.astype(np.int8), pack=8, align=True)):
        vals, ids = idx.search(q if idx.pack == 1 else q.astype(np.int8),
                               k=k)
        assert vals.shape == (7, k) and ids.shape == (7, k)
        assert_topk_match(np.asarray(vals), np.asarray(ids),
                          ref_vals, ref_ids)


def test_large_k_masked_search(rng):
    k = 200
    r = rng.integers(0, 2, (400, 96)).astype(np.float32)
    q = rng.integers(0, 2, (5, 96)).astype(np.float32)
    keep = rng.integers(0, 2, 96).astype(np.float32)
    cols = np.flatnonzero(keep)
    ref_vals, ref_ids = numpy_l2_topk(q[:, cols], r[:, cols], k)
    for idx in (FlatL2Index.build(r),
                FlatL2Index.build(r.astype(np.int8), pack=8)):
        vals, ids = idx.masked_search(
            q if idx.pack == 1 else q.astype(np.int8), jnp.asarray(keep),
            k=k)
        assert_topk_match(np.asarray(vals), np.asarray(ids),
                          ref_vals, ref_ids)


def test_streaming_chunking_and_short_tail(rng):
    """Multi-chunk merge (chunk < N, chunk < k) and the fewer-than-k-valid
    tail: (+inf, 0) filler rows, real rows exact."""
    r = rng.standard_normal((330, 48)).astype(np.float32)
    q = rng.standard_normal((4, 48)).astype(np.float32)
    ref_vals, ref_ids = numpy_l2_topk(q, r, 200)
    vals, ids = l2_ref.l2_topk_streaming(jnp.asarray(q), jnp.asarray(r),
                                         200, chunk=100)
    assert_topk_match(np.asarray(vals), np.asarray(ids), ref_vals, ref_ids)

    # tombstone all but 150 rows: entries past 150 are +inf filler
    norms = l2_ref.squared_norms(jnp.asarray(r))
    norms = norms.at[150:].set(np.inf)
    vals, ids = l2_ref.l2_topk_streaming(jnp.asarray(q), jnp.asarray(r),
                                         200, r_norms=norms, chunk=64)
    vals = np.asarray(vals)
    assert np.isinf(vals[:, 150:]).all()
    assert (np.asarray(ids)[:, :150] < 150).all()
    rv, ri = numpy_l2_topk(q, r[:150], 150)
    assert_topk_match(vals[:, :150], np.asarray(ids)[:, :150], rv, ri)
