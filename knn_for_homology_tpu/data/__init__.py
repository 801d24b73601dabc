from .dataset import Dataset
from .fasta import read_fasta, write_fasta, iter_fasta

__all__ = ["Dataset", "read_fasta", "write_fasta", "iter_fasta"]
