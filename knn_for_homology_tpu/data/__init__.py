from .builders import make_pfam_subset, make_subset_by_families
from .dataset import Dataset
from .fasta import iter_fasta, read_fasta, write_fasta
from .pfam import (
    build_domain_ranges,
    extract_full_sequences,
    get_homologous_proteins,
    get_protein_to_domain,
)
from .slices import make_slices, slice_sequence, slices_per_protein

__all__ = [
    "Dataset",
    "read_fasta",
    "write_fasta",
    "iter_fasta",
    "make_pfam_subset",
    "make_subset_by_families",
    "build_domain_ranges",
    "extract_full_sequences",
    "get_homologous_proteins",
    "get_protein_to_domain",
    "make_slices",
    "slice_sequence",
    "slices_per_protein",
]
