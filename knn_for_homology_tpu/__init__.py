"""knn_for_homology_tpu — TPU-native protein remote-homology search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
konstin/knn-for-homology (Schütze et al., Frontiers in Bioinformatics 2022):

  protein sequences
    → pLM per-residue embeddings (JAX ProtT5 / SeqVec-ELMo encoders)
    → mean-pooled per-protein / per-domain vectors
    → k-nearest-neighbour search (HBM-resident exact flat engine with a fused
      Pallas distance+top-k kernel; LSH; graph ANN) sharded over a TPU mesh
    → optional hybrid rescoring with a batched on-device Smith-Waterman
      aligner (the reference shells out to MMseqs2; we keep a format-compatible
      MMseqs2 bridge for when the binary is available)
    → evaluation (AUC1, TP, QrawTop1/QnormTop1, recall@k, PR, calibration)
      and paper-figure generation.

Layer map (mirrors SURVEY.md §1 of the reference):
  ops/       — Pallas/XLA device kernels (distance, top-k, LSH, alignment)
  search/    — index types: Flat (exact), LSH, graph ANN; persistence
  models/    — pLM encoders (ProtT5, SeqVec/ELMo), pooling, batching, registry
  parallel/  — jax.sharding meshes, sharded search/encode over ICI
  data/      — dataset contract (train/test npy+json+fasta), parsers, builders
  eval/      — vectorised metrics + figure utilities
  interop/   — MMseqs2 database formats + subprocess drivers (host edge)
  pipelines/ — CATH20 / Pfam20 / slices / benchmark workloads
"""

__version__ = "0.1.0"
