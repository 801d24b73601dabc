from .flat import FlatIndex, knn_search
from .graph import GraphIndex
from .io import read_index, write_index
from .lsh import LSHIndex

__all__ = [
    "FlatIndex",
    "GraphIndex",
    "knn_search",
    "LSHIndex",
    "read_index",
    "write_index",
]
