from .flat import FlatL2Index, HammingIndex
from .sharded import ShardedFlatL2Index
