from .sharded import (make_mesh, sharded_flat_topk, sharded_beam_search,
                      sharded_knn_round, ShardedTable)
from .engine import (ShardedDenseField, ShardedGraphIndex,
                     ShardedVectorStore, get_engine_mesh)

__all__ = ["make_mesh", "sharded_flat_topk", "sharded_beam_search",
           "sharded_knn_round", "ShardedTable", "ShardedDenseField",
           "ShardedGraphIndex", "ShardedVectorStore", "get_engine_mesh"]
