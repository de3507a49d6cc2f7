"""Sweep the fused L2 top-k kernel's tile sizes on the real TPU.

Round-3 tool: measures QPS at bench.py's exact shapes (N=331*2008,
d=2040, int8 storage, 1024-query batches x 16 chunks) for a grid of
(tq, tn, td), to pick the flagship tiling for the slim-gate epilogue.
Correctness is cross-checked against the numpy oracle on one batch.

Run: cd /root/repo && python -m tools.sweep_topk [--tq 256,512,1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rag_snvbert_tpu.index import FlatL2Index
from rag_snvbert_tpu.ops.l2_topk_pallas import l2_topk_pallas
from rag_snvbert_tpu.utils.benchmarking import fetch_scalar, steady_state_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tq", default="256,512,1024")
    ap.add_argument("--tn", default="1024")
    ap.add_argument("--td", default="2048")
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--order", default="auto",
                    choices=["auto", "qfirst", "rfirst"])
    ap.add_argument("--dtype", default="int8",
                    choices=["int8", "int4", "packed"],
                    help="index storage dtype (int4: half the HBM bytes "
                    "and the faster 4-bit MXU path — exact for binary "
                    "genotypes; packed: planar 8-per-byte bits, 1/8 the "
                    "HBM, unpacked in-VMEM by the kernel)")
    ap.add_argument("--compute", default=None, choices=[None, "int8", "int4"],
                    help="packed path MXU operand dtype (int4 = the "
                    "296-TOPs 4-bit dot; only legal in-kernel)")
    ap.add_argument("--prepad", action="store_true", help=(
        "pad refs/norms to tile multiples BEFORE the timed call, making "
        "the kernel wrapper's jnp.pad a no-op — probe_mxu3 measured the "
        "per-call pad of the 1.35 GB ref matrix as a full extra HBM "
        "round-trip"))
    args = ap.parse_args()

    n_windows, haps, d, k = 331, 2008, 2040, 10
    n, batch, chunks = n_windows * haps, 1024, args.chunks

    gen = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (n, d)).astype(jnp.int8))
    refs_dev = gen(jax.random.key(0))
    fetch_scalar(refs_dev)
    qgen = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (chunks, batch, d)).astype(jnp.bfloat16))
    qs = qgen(jax.random.key(1))
    fetch_scalar(qs)
    packed = args.dtype == "packed"
    compute = {None: None, "int8": jnp.int8, "int4": jnp.int4}[args.compute]
    if packed:
        # align=True pre-pads rows; plane width is inherently aligned.
        idx = jax.jit(lambda r: FlatL2Index.build(r, pack=8, align=True)
                      )(refs_dev)
    else:
        store_dt = {"int8": jnp.int8, "int4": jnp.int4}[args.dtype]
        idx = jax.jit(lambda r: FlatL2Index.build(r, dtype=store_dt)
                      )(refs_dev)
    fetch_scalar(idx.norms)
    print(f"data ready: N={n} d={d} stored={idx.vectors.shape} "
          f"{idx.vectors.dtype}", file=sys.stderr, flush=True)

    def make_many(tq, tn, td):
        @jax.jit
        def search_many(vectors, norms, qs):
            def body(carry, qb):
                if packed:
                    v, i = l2_topk_pallas(qb, vectors, norms, k,
                                          tq=tq, tn=tn, pack=8,
                                          compute=compute)
                else:
                    v, i = l2_topk_pallas(qb, vectors, norms, k, tq=tq,
                                          tn=tn, td=td, order=args.order)
                return carry, (v, i)
            _, (v, i) = jax.lax.scan(body, 0, qs)
            return v, i
        return search_many

    # oracle check on a 128-query slice (numpy; full batch takes minutes
    # on this 1-core host and correctness is tile-independent anyway)
    refs_np = np.asarray(refs_dev, dtype=np.float32)
    q0 = np.asarray(qs[0], dtype=np.float32)[:128]
    dists = ((q0 ** 2).sum(1)[:, None] - 2.0 * q0 @ refs_np.T
             + (refs_np ** 2).sum(1)[None, :])
    oid = np.argsort(dists, 1, kind="stable")[:, :k]

    def aligned(idx, qs, tn, td):
        nn, dd = idx.vectors.shape
        npad = -(-nn // tn) * tn - nn
        dpad = -(-dd // td) * td - dd

        @jax.jit
        def pad(v, nrm, q):
            vp = jnp.pad(v, ((0, npad), (0, dpad)))
            np_ = jnp.pad(nrm, (0, npad), constant_values=jnp.inf)
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, dpad)))
            return vp, np_, qp

        vp, nrm, qp = pad(idx.vectors, idx.norms, qs)
        fetch_scalar(nrm)
        return type(idx)(vectors=vp, norms=nrm), qp

    best = None
    td_list = [0] if packed else list(map(int, args.td.split(",")))
    for tq in map(int, args.tq.split(",")):
        for tn in map(int, args.tn.split(",")):
            for td in td_list:  # packed: td is inherent, one run
                use, uqs = (aligned(idx, qs, tn, td)
                            if args.prepad and not packed else (idx, qs))
                fn = make_many(tq, tn, td)
                t0 = time.time()
                try:
                    v, i = fn(use.vectors, use.norms, uqs)
                    fetch_scalar(i)
                except Exception as e:  # e.g. scoped-VMEM OOM at big tiles
                    print(json.dumps({"tq": tq, "tn": tn, "td": td,
                                      "error": str(e)[:200]}), flush=True)
                    continue
                compile_s = time.time() - t0
                ok = bool((np.asarray(i[0])[:128] == oid).mean() > 0.999)
                t = steady_state_ms(lambda: fn(use.vectors, use.norms, uqs),
                                    iters_lo=1, iters_hi=3)
                qps = batch / (t["per_iter_ms"] / 1e3 / chunks)
                row = {"tq": tq, "tn": tn, "td": td, "order": args.order,
                       "qps": round(qps, 1), "recall_ok": ok,
                       "ms_per_batch": round(t["per_iter_ms"] / chunks, 3),
                       "compile_s": round(compile_s, 1)}
                print(json.dumps(row), flush=True)
                if ok and (best is None or qps > best["qps"]):
                    best = row
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
