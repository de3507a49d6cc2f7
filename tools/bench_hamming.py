"""Measure HammingIndex on the real chip at chromosome scale — the
round-4 VERDICT item 6 "measure or retire" decision for the binary
intersect engine (reference: faiss.IndexBinaryFlat,
test_faiss_intersect.py:164-183).

Context: for 0/1 genotype vectors, squared L2 IS Hamming distance
(|a-b|^2 = a XOR b elementwise), so the packed planar-L2 MXU path
already answers binary queries exactly, at 1 bit/value storage.  The
XOR+popcount VPU path can therefore only be dominated; this bench pins
the factor so the retirement is a number, not an opinion.

Shapes mirror bench.py (331 windows x 2008 haps, d=2040 -> 64 uint32
words), batch sized to keep the streaming [B, chunk, words] XOR tensor
inside HBM.  Timings are fetch-forced two-point slopes
(utils/benchmarking.steady_state_ms).
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from rag_snvbert_tpu.index.flat import FlatL2Index, HammingIndex
    from rag_snvbert_tpu.utils.benchmarking import steady_state_ms

    n, d, k, b = 331 * 2008, 2040, 10, 128
    # host-side bit generation: keeps the 1.3 GB unpacked bool matrix out
    # of HBM entirely — only the packed words (170 MB) and the packed-L2
    # planes live on device.
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (n, d), dtype=np.int8).astype(bool)
    qbits = rng.integers(0, 2, (b, d), dtype=np.int8).astype(bool)

    ham = HammingIndex.build(bits)
    # the index rides as a jit ARGUMENT (struct.dataclass pytree): closing
    # over it would inline 170 MB of packed words as an mlir constant
    search = jax.jit(
        lambda h, q: h.search(q, k=k, streaming=True, chunk=4096))
    qp = jnp.asarray(qbits)
    ms = steady_state_ms(lambda: search(ham, qp)[0])["per_iter_ms"]
    ham_qps = b / (ms / 1e3)
    print(f"hamming streaming: {ms:.1f} ms / {b} queries = "
          f"{ham_qps:,.0f} QPS", file=sys.stderr)

    # the dominating path: same bits, packed planar-L2 int4-MXU kernel
    flat = FlatL2Index.build(bits.astype(np.int8), pack=8)
    q8 = jnp.asarray(np.asarray(qbits, np.int8))
    psearch = jax.jit(lambda f, q: f.search(q, k=k)[0])
    ms2 = steady_state_ms(lambda: psearch(flat, q8))["per_iter_ms"]
    l2_qps = b / (ms2 / 1e3)
    print(f"packed-L2 same workload: {ms2:.1f} ms = {l2_qps:,.0f} QPS",
          file=sys.stderr)

    # agreement: distances are identical (L2 == Hamming on bits)
    hv, hi = ham.search(qbits[:32], k=k, streaming=True)
    lv, li = flat.search(q8[:32], k=k)
    assert np.allclose(np.sort(np.asarray(hv), 1),
                       np.sort(np.asarray(lv).astype(np.int32), 1)), \
        "L2 != Hamming on bits?!"
    print(json.dumps({"hamming_qps": round(ham_qps),
                      "packed_l2_qps": round(l2_qps),
                      "speedup": round(l2_qps / ham_qps, 1),
                      "n": n, "d": d, "k": k, "batch": b}))


if __name__ == "__main__":
    main()
