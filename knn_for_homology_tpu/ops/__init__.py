from .align import align_pairs, sw_scores
from .distance import l2_normalize, similarity_block, finalize_scores, METRICS
from .flash_attention import flash_attention_t5
from .flat_pallas import pallas_flat_topk, MAX_PALLAS_K
from .lsh import hamming_topk
from .topk import flat_topk, oneshot_topk, streaming_topk

__all__ = [
    "align_pairs",
    "sw_scores",
    "flash_attention_t5",
    "flat_topk",
    "oneshot_topk",
    "hamming_topk",
    "l2_normalize",
    "similarity_block",
    "finalize_scores",
    "METRICS",
    "streaming_topk",
    "pallas_flat_topk",
    "MAX_PALLAS_K",
]
