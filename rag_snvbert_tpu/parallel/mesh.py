"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(SURVEY.md section 2.2); the TPU-native design uses a jax.sharding.Mesh with
three axes:
  - ``data``: batch-parallel training (gradients psum over ICI);
  - ``index``: reference-panel rows of the retrieval index are sharded here
    (chromosome-scale panels exceed one chip's HBM; queries are gathered
    and per-shard top-k candidates merge across chips — index/sharded.py);
  - ``model``: Megatron-style tensor parallelism for the encoder
    (parallel/tp.py) — pure sharding annotations on the QKV/FFN kernels;
    GSPMD inserts the per-block all-reduces.  Size 1 (off) by default:
    the flagship model is 8-32M params and fits one chip with room to
    spare, so TP exists for the larger-model regime, not the presets.

PP and EP remain deliberately not built: no pipeline-depth pressure at
12 layers, and no MoE anywhere in the model family (SURVEY.md
section 2.2 "model is tiny... document, don't build").
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INDEX_AXIS = "index"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_index: int = 1,
              n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, index, model) mesh.  Defaults to all devices on the
    data axis; index/model axes of size 1 are inert (P specs that name
    them shard nothing)."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_index * n_model)
    assert n_data * n_index * n_model <= len(devices), (
        f"need {n_data * n_index * n_model} devices, have {len(devices)}")
    dev_array = np.asarray(devices[: n_data * n_index * n_model]).reshape(
        n_data, n_index, n_model)
    return Mesh(dev_array, (DATA_AXIS, INDEX_AXIS, MODEL_AXIS))


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
