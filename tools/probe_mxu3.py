"""Probe 3: does a transposed-refs layout unlock the native int8 MXU rate?

probe_mxu2 showed every loop order / tile size clusters at 153-175 TOPs
— i.e. the *bf16* rate — while XLA's int8 dot on the same shape runs
243.  Hypothesis: Mosaic lowers dot_general with the contraction on rhs
dim 1 (a transposed-rhs matmul) through a relayout that forfeits the
int8 double-rate path (same failure mode as the int8 encoder-Dense
transpose dead-end, ROADMAP.md).  Variants:
  - base:   refs [N, D], contract (1)x(1)   (the round-2 kernel's dot)
  - rT:     refs stored [D, N], contract (1)x(0) (standard mk x kn)
  - rT_i4:  same, int4 operands (int4 MXU rate probe)
  - base_i4: untransposed int4
XLA rows time the same shapes outside Pallas (output summed to defeat
DCE — probe_mxu's sliced outputs got dead-code-eliminated).

Run: cd /root/repo && python -m tools.probe_mxu3
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_snvbert_tpu.utils.benchmarking import fetch_scalar, steady_state_ms

B, N, D = 1024, 664648, 2048


def _round_up(x, m):
    return -(-x // m) * m


def kern(q_ref, r_ref, out_ref, acc, *, trans):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    dims = (((1,), (0,)), ((), ())) if trans else (((1,), (1,)), ((), ()))
    acc[:] += jax.lax.dot_general(q_ref[:], r_ref[:], dims,
                                  preferred_element_type=jnp.int32)
    out_ref[:] = acc[:, :128]


@functools.partial(jax.jit, static_argnames=("tq", "tn", "dtype", "trans"))
def pallas_mm(q, r, tq, tn, dtype, trans):
    # refs stream once (grid = ref tiles slowest, full-d tiles); q resident.
    b, d = q.shape
    n = r.shape[1] if trans else r.shape[0]
    bp, np_ = _round_up(b, tq), _round_up(n, tn)
    q = q.astype(dtype)
    r = r.astype(dtype)
    qp = jnp.pad(q, ((0, bp - b), (0, 0)))
    rp = jnp.pad(r, ((0, 0), (0, np_ - n))) if trans else \
        jnp.pad(r, ((0, np_ - n), (0, 0)))
    grid = (np_ // tn, bp // tq)
    rspec = (pl.BlockSpec((d, tn), lambda j, i: (0, j),
                          memory_space=pltpu.VMEM) if trans else
             pl.BlockSpec((tn, d), lambda j, i: (j, 0),
                          memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(kern, trans=trans),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            rspec,
        ],
        out_specs=pl.BlockSpec((tq, 128), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tq, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * d,
            bytes_accessed=bp * d + np_ * d,
            transcendentals=0),
    )(qp, rp)


def main():
    refs = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (N, D)).astype(jnp.int8))(jax.random.key(0))
    fetch_scalar(refs)
    refs_t = jax.jit(lambda r: r.T.copy())(refs)
    fetch_scalar(refs_t)
    q = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (B, D)).astype(jnp.int8))(jax.random.key(1))
    fetch_scalar(q)
    flops = 2 * B * N * D

    # XLA comparators (sum defeats DCE; subtract a trivially-timed sum-only
    # baseline if needed — at these shapes the dot dominates).
    for name, dt in (("xla_int8", jnp.int8), ("xla_int4", jnp.int4)):
        try:
            f = jax.jit(lambda a, b, dt=dt: jax.lax.dot_general(
                a.astype(dt), b.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).sum())
            fetch_scalar(f(q, refs))
            ms = steady_state_ms(lambda: f(q, refs),
                                 iters_lo=1, iters_hi=3)["per_iter_ms"]
            print(json.dumps({"variant": name, "ms": round(ms, 3),
                              "TOPs": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)

    cases = [
        ("base_i8", refs, jnp.int8, False, 1024, 1024),
        ("rT_i8", refs_t, jnp.int8, True, 1024, 1024),
        ("rT_i8_512", refs_t, jnp.int8, True, 1024, 512),
        ("base_i4", refs, jnp.int4, False, 1024, 1024),
        ("rT_i4", refs_t, jnp.int4, True, 1024, 1024),
    ]
    for name, r, dt, trans, tq, tn in cases:
        try:
            fn = jax.jit(functools.partial(pallas_mm, tq=tq, tn=tn,
                                           dtype=dt, trans=trans))
            fetch_scalar(fn(q, r))
            ms = steady_state_ms(lambda: fn(q, r),
                                 iters_lo=1, iters_hi=3)["per_iter_ms"]
            print(json.dumps({"variant": name, "ms": round(ms, 3),
                              "TOPs": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
