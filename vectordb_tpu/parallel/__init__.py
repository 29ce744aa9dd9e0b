from .sharded import (make_mesh, sharded_flat_topk, sharded_beam_search,
                      sharded_knn_round, ShardedTable)

__all__ = ["make_mesh", "sharded_flat_topk", "sharded_beam_search",
           "sharded_knn_round", "ShardedTable"]
