"""Worker process for the two-process multi-host input smoke test.

Each process plays one "host" of a 2-host CPU mesh (4 virtual devices per
process, 8 global): it iterates the shared deterministic schedule
``WindowDataset.epoch_batches(host_id=, n_hosts=2)``, assembles its local
shard into a global jax.Array via ``parallel.multihost.global_batch``,
and emits order-sensitive checksums of every global batch leaf, computed
ON the mesh (a jitted weighted reduction — exercising real cross-process
Gloo collectives).

The orchestrating test (tests/test_multihost_smoke.py) compares the two
processes' outputs against each other and against a single-process
iteration of the same schedule.  This closes SURVEY §7 step 6's
"multi-host input assembly" promise with an actually-multi-process run —
the reference is strictly single-process (SURVEY §2.2), so there is no
reference analogue.

Run (spawned by the test; CPU-only, axon plugin must NOT be on
PYTHONPATH):
    python tools/multihost_worker.py <pid> <nprocs> <port> <out.json>
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    pid, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    import jax
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.parallel.mesh import make_mesh
    from rag_snvbert_tpu.parallel.multihost import global_batch

    n_glob = len(jax.devices())
    mesh = make_mesh(n_data=n_glob, n_index=1)

    # Same bundle/seed on every process — the schedule must be identical.
    b = make_bundle(n_train_samples=12, n_ref_samples=12, n_sites=96,
                    n_windows=2, seed=23)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=80)

    @jax.jit
    def checksums(batch):
        out = {}
        for k, v in batch.items():
            v = v.astype(jnp.float32)
            w = 1.0 + jnp.arange(v.shape[0], dtype=jnp.float32)
            wv = v * w.reshape((-1,) + (1,) * (v.ndim - 1))
            out[k] = jnp.stack([jnp.sum(v), jnp.sum(wv)])
        return out

    records = []
    for meta, local in ds.epoch_batches(batch_size=8, epoch=0, level=2,
                                        host_id=pid, n_hosts=nprocs):
        gb = global_batch(mesh, local)
        cs = checksums(gb)
        records.append({
            "window": int(meta.window_idx),
            "sums": {k: [float(x) for x in np.asarray(v)]
                     for k, v in sorted(cs.items())},
        })

    with open(out, "w") as f:
        json.dump(records, f)


if __name__ == "__main__":
    main()
