"""Pfam20 domain-level pipeline (subset10).

Parity with the reference's domain workload (reference: pfam/pfam.py):
kNN (LSH or flat) over domain embeddings, optional MMseqs2 baselines
(plain + --num-iterations 3) when the binary exists, the kNN→alignment
rescoring path, E-value-cutoff combination sweep, TP-set overlap stats,
precision-recall and cumulative-TP curves.

Published anchors (reference: pfam/pfam.py:456-459,536): kNN AUC1 0.565,
MMseqs2 0.659, iterated 0.743, combined E<1 0.738, kNN+align 0.69.
"""

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config import DEFAULT_HITS
from ..data.dataset import Dataset
from ..eval import analysis
from ..eval.metrics import (
    correctness_matrix,
    evaluate_rows,
    evaluate_string_results,
    hit_family_codes,
    tp_cumulative,
)

from ..search.io import read_index
from ..search.lsh import LSHIndex
from ..search.rescore import align_rescore

logger = logging.getLogger(__name__)


def run(
    dataset_path: Path,
    hits: int = 1000,
    index_path: Optional[Path] = None,
    lsh_bits: int = 1024,
    figures_dir: Optional[Path] = None,
    rescore_hits: int = DEFAULT_HITS,
) -> Dict[str, float]:
    """Returns the summary metrics dict (the reference prints these as
    result comments, pfam/pfam.py:456-459)."""
    data = Dataset.from_dir(dataset_path, hits)
    queries = data.load_test()
    summary: Dict[str, float] = {}

    # --- kNN over LSH (the reference's precomputed path, pfam/pfam.py:49-50)
    if index_path is not None and Path(index_path).exists():
        index = read_index(index_path)
    else:
        index = LSHIndex(queries.shape[1], nbits=lsh_bits).add(data.load_train())
    k = min(hits, index.ntotal)
    knn_scores, knn_hits = index.search(queries, k)
    auc1s, tps = evaluate_rows(data, knn_hits)
    summary["knn_auc1"] = float(np.mean(auc1s))
    summary["knn_tp"] = float(np.mean(tps))
    knn_correct = correctness_matrix(
        data.test_family_codes,
        hit_family_codes(knn_hits, data.train_family_codes),
    )
    summary["knn_tp10"] = float(
        (knn_correct[:, :10].sum(1) /
         data.train_family_sizes[data.test_family_codes]).mean()
    )

    # --- kNN + alignment rescoring (pfam/pfam.py:468-533) ---
    aligned, aligned_evs, _ = align_rescore(data, knn_hits[:, :rescore_hits])
    auc1s_al, tps_al = evaluate_string_results(data, aligned.items())
    summary["knn_align_auc1"] = float(np.mean(auc1s_al))
    summary["knn_align_tp"] = float(np.mean(tps_al))

    # --- MMseqs2 baselines when available (pfam/pfam.py:56-122) ---
    from ..interop import find_mmseqs

    if find_mmseqs():
        from .. import interop

        for tag, kwargs in [
            ("mmseqs", {}),
            ("mmseqs_iterated", {"num_iterations": 3}),
        ]:
            interop.search(data, **kwargs)
            mm_hits, mm_evs = interop.read_result_db_with_e_value(
                data.train_ids, data.mmseqs_train, data.test_ids,
                data.mmseqs_test, data.mmseqs_dir / "result_mmseqs2",
            )
            hit_arr, ev_arr = interop.results_to_array(mm_hits, mm_evs)
            a, t = evaluate_rows(data, hit_arr)
            summary[f"{tag}_auc1"] = float(np.mean(a))
            summary[f"{tag}_tp"] = float(np.mean(t))
            if tag == "mmseqs":
                # E-value cutoff combination sweep (pfam/pfam.py:166-199)
                mm_correct = correctness_matrix(
                    data.test_family_codes,
                    hit_family_codes(hit_arr, data.train_family_codes),
                )
                e_sorted, combined, simple = analysis.top1_cutoff_sweep(
                    ev_arr[:, 0], mm_correct[:, 0], knn_correct[:, 0]
                )
                summary["combined_best"] = float(combined.max())
                if figures_dir is not None:
                    from ..eval.figures import save_raw

                    save_raw(
                        figures_dir,
                        "combining-mmseqs-and-knn",
                        e_value_sorted=e_sorted,
                        combined_accuracy=combined,
                        mmseqs_with_cutoff_accuracy=simple,
                    )

    if figures_dir is not None:
        from ..eval.figures import figure_tp_cumulative, make_figure

        make_figure(
            figures_dir, [auc1s, auc1s_al],
            ["k-NN", "k-NN + Alignment"], "AUC1", "pfam_auc1.jpg",
        )
        figure_tp_cumulative(
            figures_dir,
            ["k-NN"],
            [tp_cumulative(data, knn_hits)],
            "tp_cumulative",
        )
    logger.info("pfam domain summary: %s", summary)
    return summary
