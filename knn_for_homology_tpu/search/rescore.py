"""Hybrid kNN + alignment rescoring — native replacement of `mmseqs align`.

The reference's hybrid configuration (its best CATH20 result) takes the kNN
hit lists, writes them as an MMseqs2 prefilter database, and re-scores each
(query, hit) pair with gapped alignment E-values
(reference: seqvec_search/main.py:146-151 → mmseqs/_align.py). Here the same
rescoring runs on-device through the batched Smith-Waterman engine
(ops/align.py); the MMseqs2 bridge (interop/) remains available when the
binary is installed.
"""

import time
from typing import Dict, List, Tuple

import numpy as np

from ..config import E_VALUE_CUTOFF
from ..data.dataset import Dataset
from ..data.fasta import read_fasta
from ..ops.align import align_pairs


def align_evalues_row_aligned(
    dataset: Dataset,
    hit_rows: np.ndarray,
    pair_batch: int = 2048,
) -> np.ndarray:
    """[Q, k] alignment E-values aligned with hit_rows' column order
    (missing hits get +inf) — the input `pipelines.pfam_proteins.run`
    expects for its merged ranking (align_rescore's dict output is E-sorted
    and cutoff-filtered, NOT row-aligned)."""
    train_seqs = read_fasta(dataset.train_sequences)
    test_seqs = read_fasta(dataset.test_sequences)
    db_residues = float(sum(len(s) for s in train_seqs.values()))
    hit_rows = np.asarray(hit_rows)
    q_n, k = hit_rows.shape
    pair_q, pair_t, positions = [], [], []
    for qi, row in enumerate(hit_rows):
        q_seq = test_seqs[dataset.test_ids[qi]]
        for col, hit in enumerate(row):
            if hit < 0:
                continue
            pair_q.append(q_seq)
            pair_t.append(train_seqs[dataset.train_ids[hit]])
            positions.append((qi, col))
    _, evs = align_pairs(
        pair_q, pair_t, db_residues=db_residues, pair_batch=pair_batch
    )
    out = np.full((q_n, k), np.inf, dtype=np.float64)
    for (qi, col), ev in zip(positions, evs):
        out[qi, col] = ev
    return out


def align_rescore(
    dataset: Dataset,
    hit_rows: np.ndarray,
    e_value_cutoff: float = E_VALUE_CUTOFF,
    pair_batch: int = 2048,
) -> Tuple[Dict[str, List[str]], Dict[str, np.ndarray], float]:
    """Re-score kNN hits with gapped alignment; order hits by E-value.

    hit_rows [Q, k] — train-set row indices (-1 = missing). Returns
    (hits: query id → hit ids ordered by ascending E-value (ties keep kNN
    order), e_values per query, wall seconds) — the same shape of result the
    reference reads back from `result_combined`
    (reference: mmseqs/_read_results_db.py:59-129); hits above the E-value
    cutoff are dropped like `mmseqs align -e` does.
    """
    start = time.time()
    train_seqs = read_fasta(dataset.train_sequences)
    test_seqs = read_fasta(dataset.test_sequences)
    db_residues = float(sum(len(s) for s in train_seqs.values()))

    pair_q: List[str] = []
    pair_t: List[str] = []
    pair_query_idx: List[int] = []
    pair_hit_row: List[int] = []
    for qi, row in enumerate(np.asarray(hit_rows)):
        q_seq = test_seqs[dataset.test_ids[qi]]
        for hit in row:
            if hit < 0:
                continue
            pair_q.append(q_seq)
            pair_t.append(train_seqs[dataset.train_ids[hit]])
            pair_query_idx.append(qi)
            pair_hit_row.append(int(hit))

    scores, evs = align_pairs(
        pair_q, pair_t, db_residues=db_residues, pair_batch=pair_batch
    )

    hits: Dict[str, List[str]] = {}
    e_values: Dict[str, np.ndarray] = {}
    pair_query_idx = np.asarray(pair_query_idx, dtype=np.int64)
    pair_hit_row = np.asarray(pair_hit_row, dtype=np.int64)
    # pairs were appended in query order → one split, not Q full scans
    counts = np.bincount(pair_query_idx, minlength=len(dataset.test_ids))
    bounds = np.concatenate([[0], np.cumsum(counts)])
    for qi in range(len(dataset.test_ids)):
        sel = np.arange(bounds[qi], bounds[qi + 1])
        if len(sel) == 0:
            hits[dataset.test_ids[qi]] = []
            e_values[dataset.test_ids[qi]] = np.zeros(0, np.float32)
            continue
        order = sel[np.argsort(evs[sel], kind="stable")]
        keep = order[evs[order] <= e_value_cutoff]
        hits[dataset.test_ids[qi]] = [
            dataset.train_ids[h] for h in pair_hit_row[keep]
        ]
        e_values[dataset.test_ids[qi]] = evs[keep]
    return hits, e_values, time.time() - start
