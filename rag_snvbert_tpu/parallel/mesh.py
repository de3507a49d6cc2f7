"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(SURVEY.md section 2.2); the TPU-native design uses a jax.sharding.Mesh with
two axes:
  - ``data``: batch-parallel training (gradients psum over ICI);
  - ``index``: reference-panel rows of the retrieval index are sharded here
    (chromosome-scale panels exceed one chip's HBM; queries are gathered
    and per-shard top-k candidates merge across chips — index/sharded.py).

For the model itself TP/PP are deliberately not built: 8-32M params
(SURVEY.md section 2.2 "model is tiny... document, don't build").
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INDEX_AXIS = "index"


def make_mesh(n_data: int | None = None, n_index: int = 1,
              devices=None) -> Mesh:
    """Build a (data, index) mesh.  Defaults to all devices on the data
    axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_index
    assert n_data * n_index <= len(devices), (
        f"need {n_data * n_index} devices, have {len(devices)}")
    dev_array = np.asarray(devices[: n_data * n_index]).reshape(
        n_data, n_index)
    return Mesh(dev_array, (DATA_AXIS, INDEX_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for training batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def index_row_sharding(mesh: Mesh, axis: str = INDEX_AXIS) -> NamedSharding:
    """Row (N-dim) sharding for index vectors/norms."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
