from . import (
    benchmark,
    cath,
    layer_mix,
    pfam_domains,
    pfam_proteins,
    reverse,
    slices_pipeline,
)

__all__ = [
    "benchmark",
    "cath",
    "layer_mix",
    "pfam_domains",
    "pfam_proteins",
    "reverse",
    "slices_pipeline",
]
