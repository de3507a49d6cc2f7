"""Device-agnostic orbax checkpoint restore.

An untargeted ``StandardCheckpointer.restore(path)`` resolves the
sharding recorded at save time against ``jax.local_devices()``; a
checkpoint written under a CPU default device then fails to load in a
process whose default backend is the TPU plugin (``ValueError: Device
TFRT_CPU_0 was not found``), and vice versa.  Restoring against
``ShapeDtypeStruct`` targets derived from the checkpoint's own metadata
places every leaf on *this* process's default device instead, so
checkpoints move freely between hosts and backends (the reference's
torch.load(map_location=...) behavior, e.g.
/root/reference/src/train_embedding_rag.py resume path).
"""

from __future__ import annotations

import os


def restore_tree(path: str):
    """Restore a full orbax checkpoint tree onto this process's default
    device, regardless of which devices it was saved under."""
    import jax
    import orbax.checkpoint as ocp

    dev = jax.config.jax_default_device or jax.devices()[0]
    sh = jax.sharding.SingleDeviceSharding(dev)
    with ocp.StandardCheckpointer() as ckptr:
        apath = os.path.abspath(path)
        meta = ckptr.metadata(apath).item_metadata.tree
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh),
            meta)
        return ckptr.restore(apath, abstract)
