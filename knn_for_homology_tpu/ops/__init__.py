from .distance import l2_normalize, similarity_block, finalize_scores, METRICS
from .topk import flat_topk, oneshot_topk, streaming_topk
from .flat_pallas import pallas_flat_topk, MAX_PALLAS_K

__all__ = [
    "l2_normalize",
    "similarity_block",
    "finalize_scores",
    "METRICS",
    "streaming_topk",
    "pallas_flat_topk",
    "MAX_PALLAS_K",
]
