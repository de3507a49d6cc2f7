"""Fused Pallas kernel tests.

The interpret-mode tests run in the default (CPU) suite on small shapes so
kernel regressions surface without hardware; the large-shape parity tests
run against real TPU hardware only (RAG_SNVBERT_TEST_TPU=1) — interpret
mode is impractically slow at chromosome scale.
"""

import os

import numpy as np
import pytest

tpu_only = pytest.mark.skipif(
    not os.environ.get("RAG_SNVBERT_TEST_TPU"),
    reason="set RAG_SNVBERT_TEST_TPU=1 to run Pallas kernel tests on TPU")


def _oracle(q, r, k):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


def _run(q, r, k, **kw):
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops import l2_ref
    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rn = np.asarray(l2_ref.squared_norms(jnp.asarray(r)))
    return l2_topk_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(rn),
                          k, **kw)


# ---- interpret-mode smoke (default suite, no hardware needed) ----

@pytest.mark.parametrize("b,n,d,k", [
    (8, 384, 128, 3),     # multiple ref tiles
    (5, 300, 96, 4),      # unaligned everything
    (16, 700, 260, 10),   # d-tiling (td=128 < d)
])
def test_kernel_interpret_matches_oracle(b, n, d, k):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    r = rng.standard_normal((n, d)).astype(np.float32)
    vals, ids = _run(q, r, k, tq=8, tn=128, td=128, interpret=True)
    ov, oi = _oracle(q, r, k)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-3, atol=1e-2)
    mism = np.asarray(ids) != oi
    if mism.any():  # id swaps allowed only at quantization-window ties
        assert np.allclose(np.asarray(vals)[mism], ov[mism],
                           rtol=1e-3, atol=1e-2)


def test_kernel_interpret_integer_vectors_exact():
    """Integer-valued vectors (genotype/token indexes): quantized keys are
    lossless, results must be bit-exact."""
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2, (8, 200)).astype(np.float32)
    r = rng.integers(0, 2, (500, 200)).astype(np.float32)
    vals, ids = _run(q, r, 5, tq=8, tn=128, td=128, interpret=True)
    ov, oi = _oracle(q, r, 5)
    assert (np.asarray(vals) == ov).all()
    assert (np.asarray(ids) == oi).all()


def test_kernel_interpret_tie_break_ascending_ids():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 2, (4, 256)).astype(np.float32)
    r = np.vstack([base, base])  # exact duplicates
    _, ids = _run(base, r, 2, tq=8, tn=128, td=128, interpret=True)
    assert np.asarray(ids)[:, 0].tolist() == [0, 1, 2, 3]
    assert np.asarray(ids)[:, 1].tolist() == [4, 5, 6, 7]


def test_kernel_interpret_padding_rows_never_retrieved():
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(3)
    r = rng.standard_normal((100, 64)).astype(np.float32)
    q = r[:6]
    rn = (r ** 2).sum(1).astype(np.float32)
    rn[50:] = np.inf  # tombstoned rows
    vals, ids = l2_topk_pallas(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(rn), 5, tq=8, tn=128, td=128,
                               interpret=True)
    assert (np.asarray(ids) < 50).all()


# ---- TPU hardware parity (large shapes) ----

@tpu_only
@pytest.mark.parametrize("b,n,d,k", [
    (37, 1000, 300, 10),     # unaligned everything
    (64, 2008, 2040, 10),    # genotype-index regime
    (4, 300, 5000, 3),       # d-tiling regime
])
def test_kernel_tpu_matches_oracle(b, n, d, k):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    r = rng.standard_normal((n, d)).astype(np.float32)
    vals, ids = _run(q, r, k)
    ov, oi = _oracle(q, r, k)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-3, atol=1e-2)
    mism = np.asarray(ids) != oi
    if mism.any():  # id differences only at (near-)ties in distance
        assert np.allclose(np.asarray(vals)[mism], ov[mism],
                           rtol=1e-3, atol=1e-2)


@tpu_only
def test_kernel_tpu_tie_break_ascending_ids():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 2, (4, 256)).astype(np.float32)
    r = np.vstack([base, base])
    _, ids = _run(base, r, 2)
    assert np.asarray(ids)[:, 0].tolist() == [0, 1, 2, 3]
    assert np.asarray(ids)[:, 1].tolist() == [4, 5, 6, 7]


def test_kernel_interpret_int8_path_exact():
    """Integer MXU path (int8 genotypes -> int32 distances): bit-exact
    results, padding tombstones honored."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(4)
    q = rng.integers(0, 2, (8, 200)).astype(np.int8)
    r = rng.integers(0, 2, (500, 200)).astype(np.int8)
    rn = (r.astype(np.float32) ** 2).sum(1)
    rn[450:] = np.inf  # tombstoned rows
    vals, ids = l2_topk_pallas(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(rn), 5, tq=8, tn=128, td=128,
                               interpret=True)
    qf, rf = q.astype(np.float32), r[:450].astype(np.float32)
    ov, oi = _oracle(qf, rf, 5)
    assert (np.asarray(vals) == ov).all()
    assert (np.asarray(ids) == oi).all()
    assert (np.asarray(ids) < 450).all()


def test_kernel_interpret_int4_path_exact():
    """int4 storage (binary genotypes on the 4-bit MXU path, round 3):
    bit-exact results.  Interpret mode upcasts the dot to int8 (the CPU
    interpreter can't lower sub-byte dots) — identical integer math; the
    true 4-bit dot runs in the TPU-gated large-shape test."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(5)
    q = rng.integers(0, 2, (8, 200)).astype(np.float32)
    r = rng.integers(0, 2, (500, 200)).astype(np.float32)
    rn = (r ** 2).sum(1)
    rn[450:] = np.inf
    vals, ids = l2_topk_pallas(jnp.asarray(q),
                               jnp.asarray(r, dtype=jnp.int4),
                               jnp.asarray(rn), 5, tq=8, tn=128, td=128,
                               interpret=True)
    ov, oi = _oracle(q, r[:450], 5)
    assert (np.asarray(vals) == ov).all()
    assert (np.asarray(ids) == oi).all()


@tpu_only
@pytest.mark.xfail(strict=False, reason=(
    "jax/axon runtime bug: an int4 (S4) array cannot cross a jit boundary "
    "— _array_shard_arg recurses infinitely device_put-ing the sub-byte "
    "layout.  The in-kernel int4 dot itself works and is faster than int8 "
    "(296 vs 270 TOPs, tools/probe_mxu3.py, cast inside one jit); this "
    "test documents the blocked path and will pass when the runtime is "
    "fixed."))
def test_kernel_tpu_int4_exact():
    """Real 4-bit MXU dot at genotype-index shapes vs numpy oracle."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(6)
    q = rng.integers(0, 2, (64, 2040)).astype(np.float32)
    r = rng.integers(0, 2, (2008, 2040)).astype(np.float32)
    rn = (r ** 2).sum(1)
    vals, ids = l2_topk_pallas(jnp.asarray(q),
                               jnp.asarray(r, dtype=jnp.int4),
                               jnp.asarray(rn), 10)
    ov, oi = _oracle(q, r, 10)
    assert (np.asarray(vals) == ov).all()
    assert (np.asarray(ids) == oi).all()


def test_kernel_interpret_rfirst_matches_qfirst():
    """The refs-outermost grid order (round 3: streams refs once) must be
    exactly equivalent to the query-outermost order, including multiple
    query tiles, the row-sliced top-k state, and tie-breaks."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas

    rng = np.random.default_rng(7)
    q = rng.integers(0, 2, (24, 120)).astype(np.int8)  # 3 query tiles @ tq=8
    r = rng.integers(0, 2, (700, 120)).astype(np.int8)
    rn = (r.astype(np.float32) ** 2).sum(1)
    rn[650:] = np.inf
    out = {}
    for order in ("qfirst", "rfirst"):
        out[order] = l2_topk_pallas(
            jnp.asarray(q), jnp.asarray(r), jnp.asarray(rn), 7,
            tq=8, tn=128, td=128, order=order, interpret=True)
    np.testing.assert_array_equal(np.asarray(out["qfirst"][0]),
                                  np.asarray(out["rfirst"][0]))
    np.testing.assert_array_equal(np.asarray(out["qfirst"][1]),
                                  np.asarray(out["rfirst"][1]))
    ov, oi = _oracle(q.astype(np.float32), r[:650].astype(np.float32), 7)
    assert (np.asarray(out["rfirst"][0]) == ov).all()
    assert (np.asarray(out["rfirst"][1]) == oi).all()


def test_kernel_interpret_fuzz_random_configs():
    """Seeded fuzz over shapes x dtypes x grid orders x tile sizes in
    interpret mode: tiling-boundary regressions (non-multiple b/n/d,
    tiny k, rfirst eligibility) surface without hardware."""
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    for case in range(10):
        b = int(rng.integers(1, 24))
        n = int(rng.integers(130, 700))
        d = int(rng.integers(16, 300))
        k = int(rng.integers(1, 12))
        integer = bool(rng.integers(0, 2))
        order = ["qfirst", "rfirst", "auto"][int(rng.integers(0, 3))]
        tq = int(rng.choice([8, 16, 32]))
        tn = int(rng.choice([128, 256]))
        td = int(rng.choice([128, 256]))
        if integer:
            q = rng.integers(0, 4, (b, d)).astype(np.int8)
            r = rng.integers(0, 4, (n, d)).astype(np.int8)
            qf, rf = q.astype(np.float32), r.astype(np.float32)
        else:
            q = qf = rng.standard_normal((b, d)).astype(np.float32)
            r = rf = rng.standard_normal((n, d)).astype(np.float32)
        vals, ids = _run(q, r, k, tq=tq, tn=tn, td=td, order=order,
                         interpret=True)
        ov, oi = _oracle(qf, rf, k)
        msg = f"case {case}: b={b} n={n} d={d} k={k} int={integer} " \
              f"order={order} tq={tq} tn={tn} td={td}"
        if integer:  # int32 distances: bit-exact
            np.testing.assert_array_equal(np.asarray(ids), oi, err_msg=msg)
            np.testing.assert_array_equal(np.asarray(vals), ov, err_msg=msg)
        else:
            np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-3,
                                       atol=1e-2, err_msg=msg)
            mism = np.asarray(ids) != oi
            if mism.any():  # id swaps only inside the quantization window
                assert np.allclose(np.asarray(vals)[mism], ov[mism],
                                   rtol=1e-3, atol=1e-2), msg


@pytest.mark.parametrize("pack,hi", [(8, 2), (4, 4), (2, 8)])
def test_kernel_interpret_packed_exact(pack, hi):
    """Planar-packed refs (pack values per byte, in-kernel unpack): must
    be bit-exact vs the oracle — integer distances."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import (l2_topk_pallas,
                                                    pack_planar,
                                                    planar_unpack)

    rng = np.random.default_rng(7)
    r = rng.integers(0, hi, (700, 300)).astype(np.int8)
    q = rng.integers(0, hi, (9, 300)).astype(np.int8)
    rp = pack_planar(r, pack)
    # round trip sanity
    np.testing.assert_array_equal(
        np.asarray(planar_unpack(rp, pack, 300)), r)
    rn = (r.astype(np.int64) ** 2).sum(1).astype(np.float32)
    vals, ids = l2_topk_pallas(jnp.asarray(q), rp, jnp.asarray(rn), 5,
                               tn=128, interpret=True, pack=pack)
    ov, oi = _oracle(q.astype(np.float32), r.astype(np.float32), 5)
    np.testing.assert_array_equal(np.asarray(ids), oi)
    np.testing.assert_array_equal(np.asarray(vals), ov.astype(np.float32))


def test_kernel_packed_guards():
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import (l2_topk_pallas,
                                                    pack_planar)

    rng = np.random.default_rng(3)
    r = rng.integers(0, 8, (256, 64)).astype(np.int8)
    rp = pack_planar(r, 2)
    rn = (r.astype(np.int64) ** 2).sum(1).astype(np.float32)
    q = rng.integers(0, 8, (8, 64)).astype(np.int8)
    with pytest.raises(ValueError, match="pack >= 4"):
        l2_topk_pallas(jnp.asarray(q), rp, jnp.asarray(rn), 3,
                       interpret=True, pack=2, compute=jnp.int4)
    big_q = rng.integers(0, 8, (4097, 64)).astype(np.int8)
    with pytest.raises(ValueError, match="chunk"):
        l2_topk_pallas(jnp.asarray(big_q), rp, jnp.asarray(rn), 3,
                       interpret=True, pack=2)


def test_kernel_interpret_wide_tile_id_bits():
    """tn=4096 widens the key id field to 12 bits (fewer merge fires);
    results stay bit-exact for integer data, packed and unpacked."""
    import jax.numpy as jnp

    from rag_snvbert_tpu.ops.l2_topk_pallas import (l2_topk_pallas,
                                                    pack_planar)

    rng = np.random.default_rng(11)
    r = rng.integers(0, 2, (5000, 260)).astype(np.int8)
    q = rng.integers(0, 2, (9, 260)).astype(np.int8)
    rn = (r.astype(np.int64) ** 2).sum(1).astype(np.float32)
    ov, oi = _oracle(q.astype(np.float32), r.astype(np.float32), 7)
    for refs, kw in ((pack_planar(r, 8), {"pack": 8}),
                     (jnp.asarray(r), {})):
        vals, ids = l2_topk_pallas(jnp.asarray(q), refs, jnp.asarray(rn),
                                   7, tn=4096, interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(ids), oi)
        np.testing.assert_array_equal(np.asarray(vals),
                                      ov.astype(np.float32))
