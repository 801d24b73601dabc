import numpy as np

from knn_for_homology_tpu.search import FlatIndex, GraphIndex, read_index, write_index


def recall(got_ids, want_ids, k):
    return np.mean(
        [
            len(set(a[:k].tolist()) & set(b[:k].tolist())) / k
            for a, b in zip(got_ids, want_ids)
        ]
    )


def test_graph_recall_vs_exact():
    rng = np.random.RandomState(31)
    db = rng.randn(2000, 64).astype(np.float32)
    q = rng.randn(64, 64).astype(np.float32)
    exact = FlatIndex(metric="cosine").add(db)
    _, exact_ids = exact.search(q, 10)
    index = GraphIndex(metric="cosine", degree=24, beam_width=128).add(db)
    scores, ids = index.search(q, 10)
    r = recall(ids, exact_ids, 10)
    # HNSW-class recall on random data (the hardest case for ANN)
    assert r > 0.9, f"recall@10 {r}"
    assert np.all(np.diff(scores, axis=1) <= 1e-5)  # descending cosine


def test_graph_l2_metric():
    rng = np.random.RandomState(32)
    db = rng.randn(800, 32).astype(np.float32)
    q = rng.randn(20, 32).astype(np.float32)
    exact = FlatIndex(metric="l2").add(db)
    _, exact_ids = exact.search(q, 5)
    index = GraphIndex(metric="l2", degree=20, beam_width=96).add(db)
    scores, ids = index.search(q, 5)
    assert recall(ids, exact_ids, 5) > 0.9
    assert np.all(np.diff(scores, axis=1) >= -1e-5)  # ascending sq distances


def test_graph_no_duplicate_hits():
    rng = np.random.RandomState(33)
    db = rng.randn(500, 16).astype(np.float32)
    q = rng.randn(11, 16).astype(np.float32)
    index = GraphIndex(metric="cosine", degree=8, beam_width=32).add(db)
    _, ids = index.search(q, 20)
    for row in ids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


def test_graph_persistence_roundtrip(tmp_path):
    rng = np.random.RandomState(34)
    db = rng.randn(300, 24).astype(np.float32)
    q = rng.randn(7, 24).astype(np.float32)
    index = GraphIndex(metric="cosine", degree=8, beam_width=32).add(db)
    s1, ids1 = index.search(q, 5)
    write_index(index, tmp_path / "g.idx")
    loaded = read_index(tmp_path / "g.idx")
    s2, ids2 = loaded.search(q, 5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
