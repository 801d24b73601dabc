import numpy as np

from knn_for_homology_tpu.eval import analysis


def test_confusion_counts():
    a = np.asarray([1, 1, 0, 0, 1], bool)
    b = np.asarray([1, 0, 1, 0, 1], bool)
    m = analysis.confusion_counts(a, b)
    assert m.tolist() == [[2, 1], [1, 1]]
    assert m.sum() == 5


def test_top1_cutoff_sweep_extremes():
    evs = np.asarray([1e-10, 1e-5, 1.0, 10.0])
    mm = np.asarray([1, 0, 1, 0], bool)
    knn = np.asarray([0, 1, 0, 1], bool)
    e_sorted, combined, simple = analysis.top1_cutoff_sweep(evs, mm, knn)
    # exact reference semantics (pfam/pfam.py:166-199): combined[i] =
    # (cumsum(mm_sorted)[i] + sum(knn_sorted[i:])) / n
    order = np.argsort(evs)
    mm_s, knn_s = mm[order], knn[order]
    n = len(evs)
    for i in range(n):
        want = (mm_s[: i + 1].sum() + knn_s[i:].sum()) / n
        assert combined[i] == want
    assert simple[-1] == mm.mean()
    # the best combination beats either method alone here
    assert combined.max() >= max(mm.mean(), knn.mean())


def test_cath_evalue_sweep_matches_loop():
    rng = np.random.RandomState(0)
    q = 200
    evs = 10.0 ** rng.uniform(-12, 4, size=q)
    mm = rng.rand(q) > 0.5
    knn = rng.rand(q) > 0.4
    possible = rng.rand(q) > 0.1
    cutoffs, simple, combined = analysis.cath_evalue_sweep(
        evs, mm, knn, possible
    )
    # reference loop semantics (cath/cath.py:625-644)
    for ci in [0, 10, 49]:
        c = cutoffs[ci]
        want_combined = (((evs < c) & mm) | ((evs > c) & knn))[possible].mean()
        want_simple = ((evs < c) & mm)[possible].mean()
        assert abs(combined[ci] - want_combined) < 1e-12
        assert abs(simple[ci] - want_simple) < 1e-12


def test_bootstrap_ci_reasonable():
    rng = np.random.RandomState(1)
    correct = rng.rand(400) > 0.3
    fams = rng.randint(0, 50, 400).astype(str)
    counts = {}
    for f in fams:
        counts[f] = counts.get(f, 0) + 1
    weights = np.asarray([1.0 / counts[f] for f in fams])
    norm_point = (correct * weights).sum() / len(counts)
    pm_norm, pm_raw = analysis.bootstrap_top1(correct, fams, norm_point, n_rounds=100)
    assert 0 < pm_raw < 0.2
    assert 0 < pm_norm < 0.2


def test_merged_auc1_two_pointer():
    # query 0: list A has the correct hit first, list B a wrong one at
    # better E-value → wrong hit terminates the leading run
    train_codes = np.asarray([0, 0, 1, 1])
    query_codes = np.asarray([0])
    sizes = np.asarray([2, 2])
    a = analysis.merged_auc1(
        hits_a=[np.asarray([0, 1])],
        evs_a=[np.asarray([0.5, 0.6])],
        hits_b=[np.asarray([2])],
        evs_b=[np.asarray([0.1])],
        train_codes=train_codes,
        query_codes=query_codes,
        family_sizes=sizes,
    )
    assert a.tolist() == [0.0]
    # same but B's hit is worse than both of A's → full leading run
    a = analysis.merged_auc1(
        [np.asarray([0, 1])],
        [np.asarray([0.5, 0.6])],
        [np.asarray([2])],
        [np.asarray([0.9])],
        train_codes,
        query_codes,
        sizes,
    )
    assert a.tolist() == [1.0]
    # duplicates are not counted twice
    a = analysis.merged_auc1(
        [np.asarray([0, 1])],
        [np.asarray([0.5, 0.6])],
        [np.asarray([0])],
        [np.asarray([0.1])],
        train_codes,
        query_codes,
        sizes,
    )
    assert a.tolist() == [1.0]


def test_remove_self_hit_lossy():
    hits = np.asarray(
        [
            [0, 7, 8],  # self first (normal)
            [7, 1, 8],  # self misplaced at column 1
            [7, 8, 9],  # self missing entirely
        ]
    )
    scores = np.asarray([[9.0, 5.0, 1.0], [9.0, 5.0, 1.0], [9.0, 5.0, 1.0]])
    out_hits, out_scores, bogus = analysis.remove_self_hit_lossy(
        hits, scores, np.asarray([0, 1, 2])
    )
    assert bogus == 1
    assert out_hits.shape == (3, 2)
    assert out_hits[0].tolist() == [7, 8]
    assert out_hits[1].tolist() == [7, 8]  # self rotated out
    assert out_hits[2].tolist() == [7, 8]  # last hit sacrificed


def test_assemble_slices():
    # two proteins, 3 slices; P1 has 2 slices whose hits overlap
    slice_proteins = ["P1", "P1", "P2"]
    homologous = {"P1": {"P2"}, "P2": {"P1"}}
    hits = np.asarray([[2, 1], [2, 0], [0, 1]])
    scores = np.asarray([[0.9, 0.8], [0.95, 0.7], [0.9, 0.85]])
    proteins, correct, auc1s = analysis.assemble_slices(
        hits, scores, slice_proteins, homologous
    )
    assert proteins == ["P1", "P2"]
    # P1: ranked hits by score: slice2(P2,0.95), slice2(P2,0.9 dup),
    # slice1(P1 self? no—self slices count as P1 hits)...
    # top unique proteins: P2 then P1; P2 is the homolog → leading run 1
    assert auc1s[0] == 1.0


def test_coverage_accuracy_monotone():
    correct = np.asarray([1, 1, 0, 1, 0], bool)
    key = np.asarray([0.1, 0.2, 0.3, 0.4, 0.5])
    x, y = analysis.coverage_accuracy(correct, key)
    assert len(x) == len(y) == 5
    assert np.all(np.diff(y) >= 0)
    assert abs(y[-1] - 3 / 6) < 1e-12


def test_rolling_mean():
    out = analysis.rolling_mean(np.asarray([1, 2, 3, 4.0]), 2)
    np.testing.assert_allclose(out, [1.5, 2.5, 3.5])


def test_length_analysis():
    rng = np.random.RandomState(2)
    lengths = rng.randint(50, 500, 300)
    # accuracy increases with length in this synthetic setup
    correct = rng.rand(300) < (lengths / 500)
    out = analysis.length_analysis(lengths, correct, window=50, n_bins=5)
    assert len(out["rolling_accuracy"]) == len(out["rolling_length"])
    assert len(out["bin_accuracy"]) == 5
    assert out["bin_accuracy"][-1] > out["bin_accuracy"][0]
    assert np.all(np.diff(out["bin_length"]) > 0)


def test_score_evalue_correlation():
    rng = np.random.RandomState(3)
    scores = rng.rand(500)
    e_values = np.exp(-10 * scores) * (1 + 0.1 * rng.rand(500))
    out = analysis.score_evalue_correlation(scores, e_values)
    assert out["pearson_r"] < -0.9  # higher score → lower log E
    assert out["spearman_r"] < -0.9
    # zero E-values (log → -inf) must not crash
    e_values[0] = 0.0
    out2 = analysis.score_evalue_correlation(scores, e_values)
    assert np.isfinite(out2["pearson_r"])


def test_score_calibration_monotone_for_clean_signal():
    rng = np.random.RandomState(4)
    scores = rng.rand(5000)
    correct = rng.rand(5000) < scores  # perfectly calibrated
    out = analysis.score_calibration(scores, correct, smoothness=10)
    assert len(out["bucket_center"]) == 10
    # calibration curve tracks the diagonal
    np.testing.assert_allclose(
        out["precision"], out["bucket_center"], atol=0.1
    )
    assert np.all(out["sem"] >= 0)


def test_class_imbalance_table():
    classes = np.asarray(["1", "1", "2", "2", "3"])
    possible = np.asarray([True, True, True, False, True])
    correct = {"M": np.asarray([1, 0, 1, 1, 0], bool)}
    out = analysis.class_imbalance_table(classes, possible, correct)
    assert out["counts"] == {"1": 2, "2": 2, "3": 1}
    assert out["counts_possible"] == {"1": 2, "2": 1, "3": 1}
    assert out["M"]["1"] == 0.5
    assert out["M"]["2"] == 1.0


def test_merge_ranked_rows_consistent_with_merged_auc1():
    """The row-based merged ranking must induce the same AUC1 as the
    dedicated merged_auc1 two-pointer (and expose TP@k of the combined
    method, which merged_auc1 cannot)."""
    from knn_for_homology_tpu.eval.metrics import auc1_tp_counts

    rng = np.random.RandomState(11)
    n_train, n_fam, q_n = 60, 6, 25
    train_codes = rng.randint(0, n_fam, n_train)
    query_codes = rng.randint(0, n_fam, q_n)
    sizes = np.bincount(train_codes, minlength=n_fam)
    hits_a, evs_a, hits_b, evs_b = [], [], [], []
    for _ in range(q_n):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        hits_a.append(rng.randint(0, n_train, la))
        evs_a.append(np.sort(rng.rand(la)))
        hits_b.append(rng.randint(0, n_train, lb))
        evs_b.append(np.sort(rng.rand(lb)))
    want = analysis.merged_auc1(
        hits_a, evs_a, hits_b, evs_b, train_codes, query_codes, sizes
    )
    rows = analysis.merge_ranked_rows(hits_a, evs_a, hits_b, evs_b, k=24)
    codes = np.where(rows < 0, -1, train_codes[np.clip(rows, 0, n_train - 1)])
    correct = codes == query_codes[:, None]
    auc1_n, _ = auc1_tp_counts(correct)
    got = auc1_n / sizes[query_codes]
    np.testing.assert_allclose(got, want)


def test_merge_ranked_rows_truncates_and_pads():
    rows = analysis.merge_ranked_rows(
        [np.asarray([3, 4, 5])], [np.asarray([0.1, 0.2, 0.3])],
        [np.asarray([4, 6])], [np.asarray([0.15, 0.25])],
        k=3,
    )
    # merged by E: 3(.1), 4(.15 from B — but 4 arrives first from... A has
    # 4 at 0.2, B at 0.15 → B wins the tie-break by earlier E), 5/6
    assert rows.shape == (1, 3)
    assert rows[0, 0] == 3
    assert set(rows[0].tolist()) <= {3, 4, 5, 6}
    rows = analysis.merge_ranked_rows(
        [np.asarray([3])], [np.asarray([0.1])],
        [np.asarray([], dtype=np.int64)], [np.asarray([])],
        k=4,
    )
    assert rows[0].tolist() == [3, -1, -1, -1]
