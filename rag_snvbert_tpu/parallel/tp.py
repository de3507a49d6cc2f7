"""Tensor parallelism as sharding annotations (Megatron pattern, GSPMD).

The TPU-native way to split a transformer over chips is not to rewrite
the model with explicit collectives but to *place* its parameters with
``model``-axis shardings and let XLA's SPMD partitioner propagate
layouts and insert the all-reduces.  The classic Megatron split falls
out of four placement rules on each encoder block:

  - attention query/key/value kernels  [.., D, D]  column-sharded
    (head dim split over ``model``; their biases follow),
  - attention output kernel            [.., D, D]  row-sharded
    (contraction dim split -> one all-reduce per block),
  - FFN w_1 kernel                     [.., D, H]  column-sharded
    (+ bias and the FFN-internal LayerNorm over H),
  - FFN w_2 kernel                     [.., H, D]  row-sharded
    (-> the block's second all-reduce).

Everything else (embeddings, fusion, RAG modules, heads, block
LayerNorms over D) is small and stays replicated.  The rules match on
path *suffixes*, so the same function shards bare params, the full
TrainState (adam mu/nu mirror the param tree paths), and
scan-stacked/[L,..]-leading layouts alike.

The reference has no analogue (single-GPU nn.DataParallel only,
SURVEY.md section 2.2); this exists for the larger-model regime — the
flagship 8-32M-param presets fit one chip and should keep ``n_model=1``.
Composes with the ``data`` axis (batch sharding) and the ``index`` axis
(sharded retrieval): ``make_mesh(n_data=2, n_index=1, n_model=4)``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (owner-module name, param name) -> which logical dim carries ``model``:
# "col" = last dim, "row" = second-to-last dim.  Lookups use the path's
# last two components, so depth (bert./encoder./block_i./ or an adam
# mu/nu mirror) and leading stacked-layer dims are irrelevant.
_COL_OWNERS = ("query", "key", "value", "qkv", "w_1")
_ROW_OWNERS = ("output", "w_2")


def _path_names(path) -> list[str]:
    names = []
    for e in path:
        if hasattr(e, "key"):
            names.append(str(e.key))
        elif hasattr(e, "name"):
            names.append(str(e.name))
        else:
            names.append(str(e))
    return names


def spec_for_path(path, leaf) -> P:
    """PartitionSpec for one state/param leaf under the Megatron rules."""
    names = _path_names(path)
    if len(names) < 2:
        return P()
    owner, param = names[-2], names[-1]
    ndim = getattr(leaf, "ndim", None) or len(getattr(leaf, "shape", ()))
    enc = "encoder" in names or any(n.startswith("block_") for n in names)
    if not enc:
        return P()
    if owner in _COL_OWNERS:
        # kernel [.., D, D|H] column-sharded; bias [.., D|H] follows
        return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
    if owner in _ROW_OWNERS:
        if param == "kernel" and ndim >= 2:
            return P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))
        return P()  # row-layer bias is added after the all-reduce
    if owner == "feed_forward" and param in ("LayerNorm_0",):
        return P()  # container, not a leaf — unreachable, kept for clarity
    if param in ("scale", "bias") and "feed_forward" in names:
        # the FFN-internal LayerNorm normalizes over the sharded H dim
        return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
    return P()


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """A NamedSharding tree (same structure as ``tree``) applying the
    Megatron rules over the mesh's ``model`` axis.  Works on a params
    tree or a whole TrainState; with ``n_model == 1`` every spec is
    effectively replicated, so it is safe to apply unconditionally."""
    _validate(tree, mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_path(path, leaf)),
        tree)


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put ``tree`` with the TP shardings."""
    return jax.device_put(tree, tp_shardings(tree, mesh))


def _validate(tree: Any, mesh: Mesh) -> None:
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model == 1:
        return
    bad = []

    def check(path, leaf):
        spec = spec_for_path(path, leaf)
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and leaf.shape[dim] % n_model != 0:
                bad.append((jax.tree_util.keystr(path), leaf.shape, dim))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise ValueError(
            f"model axis {n_model} does not divide these params "
            f"(pick dims/ffn divisible by n_model): {bad[:4]}")
