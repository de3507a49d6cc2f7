"""Probe: does this TPU expose a faster-than-int8 MXU path for int4?

Round-3 question (VERDICT item 4): genotypes are 1-bit, so if XLA/Mosaic
exposes an int4 (or 1-bit) matmul at a higher rate than int8's 2x, the
retrieval kernel (`ops/l2_topk_pallas.py`) could double its 42.7k QPS
again.  This measures raw dot_general throughput at retrieval-shaped
sizes for bf16 / int8 / int4 operands, XLA path and (where it compiles)
a minimal Pallas tile, with fetch-forced two-point-slope timing.

Result is a few JSON lines; interpret TOPs relative to the v5e peaks
(bf16 ~197, int8 ~394).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from rag_snvbert_tpu.utils.benchmarking import steady_state_ms


def bench_dot(m, n, k, dtype, acc):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (m, k)), dtype=dtype)
    b = jnp.asarray(rng.integers(0, 2, (n, k)), dtype=dtype)

    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=acc).astype(jnp.float32)

    try:
        ms = steady_state_ms(f, a, b)["per_iter_ms"]
    except Exception as e:  # noqa: BLE001 — report unsupported dtypes
        return {"dtype": str(dtype), "error": str(e)[:200]}
    tops = 2 * m * n * k / (ms * 1e-3) / 1e12
    return {"dtype": str(np.dtype(dtype)) if dtype != jnp.int4 else "int4",
            "m": m, "n": n, "k": k, "ms": round(ms, 3),
            "TOPs": round(tops, 1)}


def main():
    # Retrieval-shaped: [512, 2048] x [N, 2048]^T, N big enough to time.
    m, n, k = 512, 65536, 2048
    for dtype, acc in ((jnp.bfloat16, jnp.float32),
                      (jnp.int8, jnp.int32),
                      (jnp.int4, jnp.int32)):
        print(json.dumps(bench_dot(m, n, k, dtype, acc)), flush=True)


if __name__ == "__main__":
    main()
