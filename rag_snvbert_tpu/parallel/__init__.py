from .mesh import (DATA_AXIS, INDEX_AXIS, MODEL_AXIS, data_sharding,
                   index_row_sharding, make_mesh, replicated, shard_batch)
from .tp import shard_tree, spec_for_path, tp_shardings
