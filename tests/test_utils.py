"""Utility coverage: timing phases, benchmarking helpers, checkpoint
drift analysis, and log/metrics analysis round-trips."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from rag_snvbert_tpu.utils.analyze import (compare_checkpoints, epoch_summary,
                                           inspect_freq, load_events)
from rag_snvbert_tpu.utils.benchmarking import fetch_scalar, steady_state_ms
from rag_snvbert_tpu.utils.timing import Phase, timer


def test_phase_timers():
    p = Phase()
    with p("a"):
        time.sleep(0.01)
    with p("a"):
        pass
    with p("b"):
        pass
    s = p.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0.01
    p.reset()
    assert p.summary() == {}


def test_timer_decorator_passthrough():
    @timer
    def f(x):
        return x + 1

    assert f(1) == 2


def test_fetch_scalar_and_steady_state():
    x = jnp.ones((8, 8))
    assert fetch_scalar({"a": x}) == 1.0
    r = steady_state_ms(lambda: x * 2, iters_lo=1, iters_hi=3)
    assert "per_iter_ms" in r and np.isfinite(r["per_iter_ms"])


def test_compare_checkpoints(tmp_path):
    import orbax.checkpoint as ocp

    a = {"params": {"w": np.ones((4, 4), np.float32),
                    "b": np.zeros(4, np.float32)}}
    b = {"params": {"w": np.ones((4, 4), np.float32) * 2.0,
                    "b": np.zeros(4, np.float32)}}
    with ocp.StandardCheckpointer() as ck:
        ck.save(str(tmp_path / "a"), a, force=True)
        ck.save(str(tmp_path / "b"), b, force=True)
    df = compare_checkpoints(str(tmp_path / "a"), str(tmp_path / "b"))
    top = df.iloc[0]
    assert top["param"].endswith("/w")
    assert abs(top["delta_l2"] - 4.0) < 1e-6  # ||1||_F over 16 elements
    assert df[df["param"].str.endswith("/b")]["delta_l2"].iloc[0] == 0.0


def test_events_and_freq_inspection(tmp_path):
    ev = tmp_path / "events.jsonl"
    with open(ev, "w") as f:
        f.write(json.dumps({"event": "step", "loss": 1.0}) + "\n")
        f.write(json.dumps({"event": "train_epoch", "epoch": 0}) + "\n")
    df = load_events(str(ev), event="step")
    assert len(df) == 1 and df.iloc[0]["loss"] == 1.0

    from rag_snvbert_tpu.io.freq import FreqTable, build_freq_matrix

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 2, (50, 10, 2)).astype(np.int8)
    ft = FreqTable(build_freq_matrix(gt, np.zeros(10, np.int64), 1),
                   np.arange(50))
    ft.save(str(tmp_path / "freq"))
    rep = inspect_freq(str(tmp_path / "freq"))
    assert rep["nan_count"] == 0 and rep["gt_layers_sum_to_1"]
