"""Two-process multi-host input smoke: epoch_batches(host_id=) +
parallel.multihost.global_batch under real jax.distributed (Gloo CPU
collectives), asserted against the single-process schedule.

The reference is strictly single-process (SURVEY §2.2); this validates
the beyond-reference multi-host path promised by SURVEY §7 step 6 with
actual multiple processes — each subprocess hosts 4 virtual CPU devices
of an 8-device global mesh and contributes its local shard of every
global batch.  Subprocesses run WITHOUT the axon TPU plugin on
PYTHONPATH (CPU-only), so this is safe to run while the TPU is busy.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_epoch_matches_single(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"host{i}.json" for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
         str(i), "2", str(port), str(outs[i])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    rec0 = json.loads(outs[0].read_text())
    rec1 = json.loads(outs[1].read_text())
    # both processes computed the same GLOBAL checksums (the jitted
    # reduction ran over the full 8-device array, not the local shard)
    assert rec0 == rec1
    assert len(rec0) == 4  # 2 windows x ceil(12 samples / batch 8)

    # single-process reference over the same deterministic schedule
    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle

    b = make_bundle(n_train_samples=12, n_ref_samples=12, n_sites=96,
                    n_windows=2, seed=23)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=80)
    it = ds.epoch_batches(batch_size=8, epoch=0, level=2)
    for rec, (meta, batch) in zip(rec0, it):
        assert rec["window"] == int(meta.window_idx)
        for k, (s, ws) in rec["sums"].items():
            v = batch[k].astype(np.float64)
            w = 1.0 + np.arange(v.shape[0], dtype=np.float64)
            wv = v * w.reshape((-1,) + (1,) * (v.ndim - 1))
            np.testing.assert_allclose(
                [s, ws], [v.sum(), wv.sum()], rtol=2e-5,
                err_msg=f"window {rec['window']} key {k}")
