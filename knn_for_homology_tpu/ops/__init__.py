from .align import align_hits, align_pairs, sw_scores, sw_scores_grouped
from .align_pallas import sw_scores_grouped_pallas
from .distance import l2_normalize, similarity_block, finalize_scores, METRICS
from .exact_pallas import exact_pallas_topk, exact_pallas_topk_traced
from .flash_attention import flash_attention_t5
from .flat_pallas import pallas_flat_topk, MAX_PALLAS_K
from .graph_pallas import beam_expand, pack_neighbours
from .lsh import hamming_topk
from .topk import flat_topk, oneshot_topk, streaming_topk

__all__ = [
    "align_hits",
    "align_pairs",
    "sw_scores_grouped",
    "sw_scores_grouped_pallas",
    "exact_pallas_topk",
    "exact_pallas_topk_traced",
    "beam_expand",
    "pack_neighbours",
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
