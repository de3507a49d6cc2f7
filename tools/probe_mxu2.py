"""Probe 2: Mosaic int8 matmul structure — loop order, tile size, semantics.

probe_mxu showed the Pallas matmul alone runs ~150 TOPs vs XLA's 243 at
the same shape.  Variants here:
  - qfirst: round-2 kernel order (i=query tile slowest -> refs streamed
    bp/tq times from HBM)
  - rfirst: j=ref tile slowest -> refs streamed ONCE (queries are tiny)
  - par: first grid dim marked "parallel"
  - tile sizes up to 1024x2048

Run: cd /root/repo && python -m tools.probe_mxu2
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_snvbert_tpu.utils.benchmarking import fetch_scalar, steady_state_ms

B, N, D = 1024, 664648, 2040


def _round_up(x, m):
    return -(-x // m) * m


def kern(q_ref, r_ref, out_ref, acc, *, nd):
    kd = pl.program_id(2)

    @pl.when(kd == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        q_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kd == nd - 1)
    def _():
        out_ref[:] = acc[:, :128]


@functools.partial(jax.jit, static_argnames=("tq", "tn", "td", "order",
                                             "par"))
def pallas_mm(q, r, tq, tn, td, order="qfirst", par=False):
    b, d = q.shape
    n, _ = r.shape
    bp, np_, dp = _round_up(b, tq), _round_up(n, tn), _round_up(d, td)
    qp = jnp.pad(q, ((0, bp - b), (0, dp - d)))
    rp = jnp.pad(r, ((0, np_ - n), (0, dp - d)))
    if order == "qfirst":
        grid = (bp // tq, np_ // tn, dp // td)
        qmap = lambda i, j, kd: (i, kd)
        rmap = lambda i, j, kd: (j, kd)
        omap = lambda i, j, kd: (i, 0)
    else:  # refs stream once; query tiles inner
        grid = (np_ // tn, bp // tq, dp // td)
        qmap = lambda j, i, kd: (i, kd)
        rmap = lambda j, i, kd: (j, kd)
        omap = lambda j, i, kd: (i, 0)
    sem = ("parallel" if par else "arbitrary", "arbitrary", "arbitrary")
    return pl.pallas_call(
        functools.partial(kern, nd=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, td), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, td), rmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, 128), omap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tq, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp,
            bytes_accessed=bp * dp + np_ * dp,
            transcendentals=0),
    )(qp, rp)


def main():
    refs = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (N, D)).astype(jnp.int8))(jax.random.key(0))
    fetch_scalar(refs)
    q = jax.jit(lambda key: jax.random.bernoulli(
        key, 0.5, (B, D)).astype(jnp.int8))(jax.random.key(1))
    fetch_scalar(q)
    flops = 2 * B * N * D

    cases = [
        ("qfirst", 256, 1024, 2048, False),
        ("rfirst", 256, 1024, 2048, False),
        ("rfirst", 1024, 512, 2048, False),
        ("rfirst", 1024, 1024, 2048, False),
        ("rfirst", 512, 2048, 2048, False),
        ("rfirst", 1024, 2048, 2048, False),
        ("rfirst", 1024, 1024, 2048, True),
    ]
    for order, tq, tn, td, par in cases:
        tag = f"{order}_{tq}x{tn}x{td}{'_par' if par else ''}"
        try:
            fn = jax.jit(functools.partial(pallas_mm, tq=tq, tn=tn, td=td,
                                           order=order, par=par))
            fetch_scalar(fn(q, refs))
            t = steady_state_ms(lambda: fn(q, refs), iters_lo=1, iters_hi=3)
            ms = t["per_iter_ms"]
            print(json.dumps({"variant": tag, "ms": round(ms, 3),
                              "TOPs": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": tag, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
