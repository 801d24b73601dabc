import numpy as np

from knn_for_homology_tpu.data import Dataset
from knn_for_homology_tpu.eval import (
    auc1_tp_counts,
    evaluate_rows,
    evaluate_string_results,
    tp_cumulative,
)


def test_auc1_tp_counts_leading_run():
    correct = np.array(
        [
            [1, 1, 0, 1],  # leading run 2, total 3
            [0, 1, 1, 1],  # leading run 0, total 3
            [1, 1, 1, 1],  # all correct
            [0, 0, 0, 0],  # none
        ],
        dtype=bool,
    )
    auc1, tp = auc1_tp_counts(correct)
    assert auc1.tolist() == [2, 0, 4, 0]
    assert tp.tolist() == [3, 3, 4, 0]


def test_evaluate_rows_matches_string_evaluate(synthetic_dataset):
    ds = Dataset.from_dir(synthetic_dataset, hits=5)
    rng = np.random.RandomState(0)
    hit_rows = rng.randint(0, len(ds.train_ids), size=(len(ds.test_ids), 5))
    auc1s, tps = evaluate_rows(ds, hit_rows)

    # reference-style string-land evaluation must agree exactly
    results = [
        (ds.test_ids[i], [ds.train_ids[j] for j in row])
        for i, row in enumerate(hit_rows)
    ]
    auc1s_ref, tps_ref = evaluate_string_results(ds, results)
    assert auc1s == auc1s_ref
    assert tps == tps_ref


def test_evaluate_rows_padding_is_wrong_hit(synthetic_dataset):
    ds = Dataset.from_dir(synthetic_dataset, hits=4)
    q = len(ds.test_ids)
    # first two hits correct (same family rows), then -1 padding
    fam_rows = {}
    for i, code in enumerate(ds.train_family_codes):
        fam_rows.setdefault(int(code), []).append(i)
    hit_rows = np.full((q, 4), -1, dtype=np.int64)
    for i, code in enumerate(ds.test_family_codes):
        hit_rows[i, :2] = fam_rows[int(code)][:2]
    auc1s, tps = evaluate_rows(ds, hit_rows)
    # every family has 6 train members → 2/6 each
    assert all(abs(a - 2 / 6) < 1e-12 for a in auc1s)
    assert all(abs(t - 2 / 6) < 1e-12 for t in tps)


def test_tp_cumulative_simple(synthetic_dataset):
    ds = Dataset.from_dir(synthetic_dataset)
    q = len(ds.test_ids)
    fam_rows = {}
    for i, code in enumerate(ds.train_family_codes):
        fam_rows.setdefault(int(code), []).append(i)
    # perfect hits: all 6 family members in order
    hit_rows = np.stack(
        [np.asarray(fam_rows[int(c)]) for c in ds.test_family_codes]
    )
    curve = tp_cumulative(ds, hit_rows)
    np.testing.assert_allclose(curve, np.arange(1, 7) / 6.0)


def test_artifact_cache(tmp_path):
    from knn_for_homology_tpu.utils.artifacts import (
        cached_array,
        content_key,
        skip_if_exists,
    )

    calls = []

    def compute():
        calls.append(1)
        return np.arange(5)

    key = content_key(seed=1, n=5)
    out1 = cached_array(tmp_path / "a.npy", compute, key)
    out2 = cached_array(tmp_path / "a.npy", compute, key)
    np.testing.assert_array_equal(out1, out2)
    assert len(calls) == 1  # second call hit the cache
    # changed inputs → different key → recompute
    cached_array(tmp_path / "a.npy", compute, content_key(seed=2, n=5))
    assert len(calls) == 2
    assert skip_if_exists(tmp_path / "a.npy")
    assert not skip_if_exists(tmp_path / "missing.npy")
    # array inputs hash by content
    assert content_key(x=np.ones(3)) != content_key(x=np.zeros(3))
