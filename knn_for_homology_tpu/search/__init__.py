from .flat import FlatIndex, knn_search

__all__ = ["FlatIndex", "knn_search"]
