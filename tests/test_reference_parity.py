"""Golden parity against the reference's committed fixtures and test values.

The reference asserts exact FAISS-derived metrics
(reference: tests/test_main.py:10-38); our engine must reproduce the same
neighbour structure on the same data. Fixture *data* files are read in place
from the read-only reference checkout.
"""

import numpy as np
import pytest

from knn_for_homology_tpu.data import Dataset
from knn_for_homology_tpu.eval import evaluate_rows
from knn_for_homology_tpu.search import knn_search


def test_small_random_goldens(reference_data_dir):
    # reference: tests/test_main.py:10-18
    ds = Dataset.from_dir(reference_data_dir / "small-random", hits=5)
    ids, scores, _ = knn_search(ds.load_train(), ds.load_test(), ds.hits)
    auc1s, tps = evaluate_rows(ds, ids)
    assert auc1s == [1.0, 1 / 3, 2 / 3, 0.0, 0.0, 1 / 3]
    assert tps == [1.0, 2 / 3, 2 / 3, 1.0, 1.0, 1.0]


def test_pfam_20_10_goldens(reference_data_dir):
    # reference: tests/test_main.py:21-27
    ds = Dataset.from_dir(reference_data_dir / "pfam-20-10", hits=10)
    ids, scores, _ = knn_search(ds.load_train(), ds.load_test(), ds.hits)
    auc1s, tps = evaluate_rows(ds, ids)
    assert np.mean(auc1s) == 0.871
    assert np.mean(tps) == 0.91


def test_pfam_20_10_pallas_backend(reference_data_dir):
    # the fused Pallas kernel must produce the same hit lists
    ds = Dataset.from_dir(reference_data_dir / "pfam-20-10", hits=10)
    ids_x, _, _ = knn_search(ds.load_train(), ds.load_test(), ds.hits, backend="xla")
    from knn_for_homology_tpu.search.flat import FlatIndex

    index = FlatIndex(metric="cosine", backend="pallas").add(ds.load_train())
    _, ids_p = index.search(ds.load_test(), ds.hits)
    np.testing.assert_array_equal(ids_p, ids_x)


def test_pfam_20_10_sharded(reference_data_dir):
    # sharded search must keep the goldens (SURVEY.md §4 requirement)
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.parallel import db_sharded_topk, make_mesh

    ds = Dataset.from_dir(reference_data_dir / "pfam-20-10", hits=10)
    mesh = make_mesh(8)
    db = l2_normalize(jnp.asarray(ds.load_train(), dtype=jnp.float32))
    q = l2_normalize(jnp.asarray(ds.load_test(), dtype=jnp.float32))
    _, ids = db_sharded_topk(db, q, 10, mesh, metric="cosine")
    auc1s, tps = evaluate_rows(ds, np.asarray(ids))
    assert np.mean(auc1s) == 0.871
    assert np.mean(tps) == 0.91


def test_fasta_parser_goldens(reference_data_dir):
    # reference: tests/test_utils.py:7-15
    from knn_for_homology_tpu.data import read_fasta

    sequences = read_fasta(
        reference_data_dir / "sequences.fasta", lambda x: x.split(" ")[0]
    )
    assert list(sequences.keys()) == [
        "sp|P00864|CAPP_ECOLI",
        "6U7P:A|PDBID|CHAIN|SEQUENCE",
    ]
    assert len(sequences["sp|P00864|CAPP_ECOLI"]) == 883
    assert len(sequences["6U7P:A|PDBID|CHAIN|SEQUENCE"]) == 99


def test_pfam_20_dist_regression_pin(reference_data_dir):
    """Third reference fixture (seed-42 distribution subset) — no published
    golden exists, so the measured value is pinned as a regression anchor:
    mean AUC1 0.77265, TP 0.86259 at hits=13."""
    ds = Dataset.from_dir(reference_data_dir / "pfam-20-dist", hits=13)
    ids, scores, _ = knn_search(ds.load_train(), ds.load_test(), ds.hits)
    auc1s, tps = evaluate_rows(ds, ids)
    assert abs(np.mean(auc1s) - 0.772653) < 1e-4
    assert abs(np.mean(tps) - 0.862594) < 1e-4


def test_lsh_band_on_reference_fixture(reference_data_dir):
    """1024-bit LSH on pfam-20-10 lands in a stable quality band just
    under exact search (measured 0.848 / 0.894; exact 0.871 / 0.91)."""
    from knn_for_homology_tpu.search import LSHIndex

    ds = Dataset.from_dir(reference_data_dir / "pfam-20-10", hits=10)
    index = LSHIndex(dim=1024, nbits=1024).add(ds.load_train())
    _, ids = index.search(ds.load_test(), 10)
    auc1s, tps = evaluate_rows(ds, ids)
    assert np.mean(auc1s) > 0.82
    assert np.mean(tps) > 0.87
