from . import (
    benchmark,
    cath,
    embed,
    harness,
    layer_mix,
    pfam_domains,
    pfam_proteins,
    reverse,
    slices_pipeline,
)

__all__ = [
    "benchmark",
    "cath",
    "embed",
    "harness",
    "layer_mix",
    "pfam_domains",
    "pfam_proteins",
    "reverse",
    "slices_pipeline",
]
