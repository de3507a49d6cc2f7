"""North-star benchmark: exact-L2 retrieval QPS on TPU vs CPU flat search.

Workload mirrors the reference's offline query engine
(build_ref_db_l2.py + batch_test_faiss_l2.py): a chromosome-scale genotype
index — 331 windows x 2008 haplotypes, d = win_len*2 = 2040 — searched with
batched queries at k=10.  Here all windows live in one HBM-resident index
(331*2008 = 664,648 vectors) searched by the fused Pallas kernel; the
baseline is the same exact search on the host CPU via BLAS sgemm +
argpartition (the faiss-flat-CPU algorithm; faiss itself is not installed
in this image).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def cpu_flat_search(queries, refs, r_norms, k):
    """Exact L2 top-k on CPU: sgemm + argpartition (faiss-flat equivalent)."""
    dots = queries @ refs.T
    d = (queries ** 2).sum(1)[:, None] - 2.0 * dots + r_norms[None, :]
    idx = np.argpartition(d, k, axis=1)[:, :k]
    vals = np.take_along_axis(d, idx, axis=1)
    order = np.argsort(vals, axis=1)
    return np.take_along_axis(vals, order, 1), np.take_along_axis(idx, order, 1)


def main():
    n_windows, haps, d, k = 331, 2008, 2040, 10
    n = n_windows * haps
    batch = 256
    rng = np.random.default_rng(0)

    refs = rng.integers(0, 2, (n, d)).astype(np.float32)
    queries = rng.integers(0, 2, (batch, d)).astype(np.float32)

    # ---- CPU baseline (scaled-down batch, same per-query work) ----
    cpu_batch = 32
    r_norms = (refs ** 2).sum(1)
    t0 = time.time()
    cpu_flat_search(queries[:cpu_batch], refs, r_norms, k)
    cpu_dt = time.time() - t0
    cpu_qps = cpu_batch / cpu_dt

    # ---- TPU: fused Pallas kernel over the HBM-resident index ----
    import jax
    import jax.numpy as jnp

    from rag_snvbert_tpu.index import FlatL2Index

    # Ship genotypes as int8 (1 B/elem) and cast to bf16 on device — host
    # link bandwidth dominates chromosome-scale build time.
    from rag_snvbert_tpu.utils import benchmarking as bm

    t0 = time.time()
    refs_dev = jax.device_put(refs.astype(np.int8))
    idx = FlatL2Index.build(refs_dev, dtype=jnp.bfloat16)
    bm.fetch_scalar(idx.norms)
    build_s = time.time() - t0

    from rag_snvbert_tpu.utils.benchmarking import fetch_scalar, steady_state_ms

    q = jnp.asarray(queries, dtype=jnp.bfloat16)
    t0 = time.time()
    vals, ids = idx.search(q, k=k)
    fetch_scalar(ids)  # hard completion barrier (block_until_ready is not
    # reliable on remote-attached runtimes)
    compile_s = time.time() - t0

    timing = steady_state_ms(lambda: idx.search(q, k=k),
                             iters_lo=4, iters_hi=20)
    tpu_dt = timing["per_iter_ms"] / 1e3
    tpu_qps = batch / tpu_dt

    # Correctness check against CPU exact search.  0/1 genotype vectors
    # produce many exact distance ties at the k boundary, so recall is
    # tie-aware: a retrieved id counts as correct iff its exact distance is
    # <= the oracle's k-th distance (any such id is a valid exact top-k).
    cv, ci = cpu_flat_search(queries[:cpu_batch], refs, r_norms, k)
    got = np.asarray(ids)[:cpu_batch]
    kth = cv[:, -1][:, None]
    got_d = np.stack([((queries[i] - refs[got[i]]) ** 2).sum(-1)
                      for i in range(cpu_batch)])
    recall = float((got_d <= kth + 1e-3).mean())

    result = {
        "metric": "l2_query_qps_chip",
        "value": round(tpu_qps, 1),
        "unit": "queries/s (331x2008 genotype index, d=2040, k=10; baseline = 1-core numpy/OpenBLAS exact search)",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "detail": {
            "cpu_flat_qps": round(cpu_qps, 1),
            "index_build_s": round(build_s, 3),
            "first_search_s": round(compile_s, 3),
            "steady_ms_per_batch": round(tpu_dt * 1e3, 3),
            "recall_at_10_vs_exact": round(float(recall), 4),
            "n_vectors": n,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
