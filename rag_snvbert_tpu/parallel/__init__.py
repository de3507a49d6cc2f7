from .mesh import (DATA_AXIS, INDEX_AXIS, data_sharding, index_row_sharding,
                   make_mesh, replicated, shard_batch)
