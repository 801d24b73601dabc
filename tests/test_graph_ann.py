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


def test_nn_descent_build_recall():
    """kNN-descent graph must approach the exact graph's search quality —
    the scalable build for databases where O(N²) is unaffordable."""
    rng = np.random.RandomState(35)
    db = rng.randn(1500, 48).astype(np.float32)
    q = rng.randn(40, 48).astype(np.float32)
    exact = FlatIndex(metric="cosine").add(db)
    _, exact_ids = exact.search(q, 10)
    index = GraphIndex(
        metric="cosine", degree=24, beam_width=128, build="nn-descent"
    ).add(db)
    _, ids = index.search(q, 10)
    r = recall(ids, exact_ids, 10)
    assert r > 0.85, f"nn-descent recall@10 {r}"


def test_nn_descent_graph_properties():
    from knn_for_homology_tpu.search.graph import nn_descent_build

    rng = np.random.RandomState(36)
    db = rng.randn(300, 16).astype(np.float32)
    import jax.numpy as jnp

    graph = nn_descent_build(jnp.asarray(db), degree=8, iters=5)
    assert graph.shape == (300, 8)
    # no self-loops, no duplicate neighbours per row
    for i, row in enumerate(graph):
        assert i not in row.tolist()
        assert len(set(row.tolist())) == 8


def test_hit_set_overlap():
    from knn_for_homology_tpu.eval.analysis import hit_set_overlap

    a = [np.asarray([1, 2, 3]), np.asarray([4, -1, -1])]
    b = [np.asarray([2, 3, 9]), np.asarray([4, 5, 6])]
    out = hit_set_overlap(a, b)
    assert out == {"only_a": 1, "both": 3, "only_b": 3}
