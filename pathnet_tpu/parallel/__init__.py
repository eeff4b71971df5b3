from .mesh import (make_mesh, shard_spec, sharded_train_step, replicate,
                   param_shardings)
from .ring import make_ring_gather, pad_rows
from .sparse import (make_sparse_gather, make_sparse_gather_sharded,
                     exchange_comm_words)

__all__ = ["make_mesh", "shard_spec", "sharded_train_step", "replicate",
           "param_shardings", "make_ring_gather", "pad_rows",
           "make_sparse_gather", "make_sparse_gather_sharded",
           "exchange_comm_words"]
