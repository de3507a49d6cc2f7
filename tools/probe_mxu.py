"""Probe: in-Pallas int8 matmul rate vs XLA, at retrieval tile shapes.

The fused top-k kernel runs at ~116 effective TOPs while plain XLA int8
dot_general measures 243 TOPs on this chip (tools/probe_int4.py), and
slimming the VPU epilogue to 1 op/element does not move it.  This
isolates WHERE the kernel's time goes: a Pallas kernel that does ONLY
the tiled int8 matmul + accumulator (no top-k epilogue), swept over
tile shapes, vs the XLA dot at the same total shape, plus an int4 XLA
dot (device-side cast; jnp.asarray of int4 crashes host-side).

Run: cd /root/repo && python -m tools.probe_mxu
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_snvbert_tpu.utils.benchmarking import fetch_scalar, steady_state_ms

B, N, D = 1024, 664648, 2040


def _round_up(x, m):
    return -(-x // m) * m


def matmul_only_kernel(q_ref, r_ref, out_ref, acc, *, nd):
    kd = pl.program_id(2)

    @pl.when(kd == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        q_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    # Tiny output: one lane-slice of the accumulator, so nothing is
    # dead-code-eliminated but no [B, N] matrix is written to HBM.
    @pl.when(kd == nd - 1)
    def _():
        out_ref[:] = acc[:, :128]


@functools.partial(jax.jit, static_argnames=("tq", "tn", "td"))
def pallas_matmul(q, r, tq, tn, td):
    b, d = q.shape
    n, _ = r.shape
    bp, np_, dp = _round_up(b, tq), _round_up(n, tn), _round_up(d, td)
    qp = jnp.pad(q, ((0, bp - b), (0, dp - d)))
    rp = jnp.pad(r, ((0, np_ - n), (0, dp - d)))
    grid = (bp // tq, np_ // tn, dp // td)
    return pl.pallas_call(
        functools.partial(matmul_only_kernel, nd=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, td), lambda i, j, kd: (i, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, td), lambda i, j, kd: (j, kd),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, 128), lambda i, j, kd: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tq, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp,
            bytes_accessed=bp * dp + (bp // tq) * np_ * dp,
            transcendentals=0),
    )(qp, rp)


def main():
    gen = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (N, D)).astype(jnp.int8))
    refs = gen(jax.random.key(0))
    fetch_scalar(refs)
    q = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (B, D)).astype(jnp.int8))(jax.random.key(1))
    fetch_scalar(q)
    flops = 2 * B * N * D

    # XLA reference point (int8 and int4-cast-on-device)
    for name, cast in (("xla_int8", None), ("xla_int4", jnp.int4)):
        @jax.jit
        def f(q, r, cast=cast):
            if cast is not None:
                q, r = q.astype(cast), r.astype(cast)
            out = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return out[:, :128]  # keep HBM writeback small & comparable
        try:
            fetch_scalar(f(q, refs))
            t = steady_state_ms(lambda: f(q, refs), iters_lo=1, iters_hi=3)
            ms = t["per_iter_ms"]
            print(json.dumps({"variant": name, "ms": round(ms, 3),
                              "TOPs": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    for tq, tn, td in ((256, 512, 2048), (256, 1024, 2048), (512, 512, 2048),
                       (256, 512, 1024), (128, 2048, 2048)):
        try:
            fn = jax.jit(lambda q, r, tq=tq, tn=tn, td=td: pallas_matmul(
                q, r, tq, tn, td))
            fetch_scalar(fn(q, refs))
            t = steady_state_ms(lambda: fn(q, refs), iters_lo=1, iters_hi=3)
            ms = t["per_iter_ms"]
            print(json.dumps({"variant": f"pallas_mm_{tq}x{tn}x{td}",
                              "ms": round(ms, 3),
                              "TOPs": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"pallas_mm_{tq}x{tn}x{td}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
