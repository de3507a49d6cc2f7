"""Multi-host input assembly: turn each process's local batch shard into a
global sharded array.

The reference is strictly single-process (SURVEY.md section 2.2: no
torch.distributed anywhere); on multi-host TPU meshes, JAX processes each
see only their local devices, so batches must be assembled per host and
stitched into one global jax.Array.  WindowDataset.epoch_batches(host_id=,
n_hosts=) yields the process-local slice of every global batch on a shared
deterministic schedule; this helper lifts it onto the mesh.

Single-host meshes (including the virtual CPU test mesh) work unchanged —
make_array_from_process_local_data degrades to a plain device_put.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def global_batch(mesh: Mesh, local_batch: dict,
                 axis: str = DATA_AXIS) -> dict:
    """Assemble a global batch from this process's local shard.

    ``local_batch``: numpy arrays whose leading dim is this host's slice
    (global_batch_size / process_count rows).  Returns jax.Arrays sharded
    over ``axis`` whose global shape stitches every process's rows.
    """
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local_batch.items()}
