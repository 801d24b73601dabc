from .mesh import make_mesh, DATA_AXIS, MODEL_AXIS, replicated, row_sharded
from .scale import (
    DCN_AXIS,
    ShardedFlatIndex,
    ShardedGraphIndex,
    ShardedIVFIndex,
    ShardedLSHIndex,
    make_pod_mesh,
    stream_add,
)
from .sharded import db_sharded_topk, query_sharded_topk, sharded_search

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "replicated",
    "row_sharded",
    "db_sharded_topk",
    "query_sharded_topk",
    "sharded_search",
    "DCN_AXIS",
    "ShardedFlatIndex",
    "ShardedGraphIndex",
    "ShardedIVFIndex",
    "ShardedLSHIndex",
    "make_pod_mesh",
    "stream_add",
]
