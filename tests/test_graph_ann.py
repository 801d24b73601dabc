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


def test_packed_beam_matches_xla_path():
    """packed='always' (Pallas fused expansion, interpret mode on CPU) must
    find the same neighbours as the XLA gather path at equal settings."""
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import graph_pallas as gp

    rng = np.random.RandomState(5)
    n, d = 512, 128
    fams = np.repeat(np.arange(32), 16)
    db = ((rng.randn(32, d) * 6)[fams] + rng.randn(n, d)).astype(np.float32)
    queries = db[rng.choice(n, 24, replace=False)] + 0.05 * rng.randn(
        24, d
    ).astype(np.float32)

    a = GraphIndex(degree=8, beam_width=32, expand=4, packed="never").add(db)
    b = GraphIndex(degree=8, beam_width=32, expand=4, packed="always").add(db)
    sa, ia = a.search(queries, 5)
    sb, ib = b.search(queries, 5)
    # identical graphs + exact fp32 rescore → identical ids and scores
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, atol=1e-5)


def test_beam_expand_kernel_oracle():
    """beam_expand (interpret) against the numpy oracle, including padded
    adjacency (-1 ids → zero slabs / -inf lanes)."""
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import graph_pallas as gp

    rng = np.random.RandomState(1)
    n_nodes, d, deg, e, q_n = 96, 256, 11, 3, 6
    db = rng.randn(n_nodes, d).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    graph = rng.randint(0, n_nodes, (n_nodes, deg)).astype(np.int32)
    graph[::7, -2:] = -1  # holes in the adjacency
    deg_p = gp.pad_degree(deg)
    pv, pi, sc = gp.pack_neighbours(
        jnp.asarray(db), jnp.asarray(graph), deg_p
    )
    sel = rng.randint(0, n_nodes, (q_n, e)).astype(np.int32)
    queries = rng.randn(q_n, d).astype(np.float32)
    sims, nbrs = gp.beam_expand(
        jnp.asarray(sel), jnp.asarray(queries), pv, pi, sc, deg_p,
        interpret=True,
    )
    ref_s, ref_n = gp.beam_expand_reference(
        sel, queries, np.asarray(pv), np.asarray(pi), np.asarray(sc), deg_p
    )
    np.testing.assert_array_equal(np.asarray(nbrs), ref_n)
    np.testing.assert_allclose(
        np.asarray(sims)[:, :, :deg_p], ref_s[:, :, :deg_p], atol=1e-5
    )
    # a -1 adjacency hole scores exactly 0 (zero slab), never -inf leakage
    assert np.isfinite(np.asarray(sims)[:, :, :deg_p]).all()


def test_beam_expand_dma_kernel_parity_on_tpu():
    """The production manual-DMA expansion kernel vs the numpy oracle.

    Interpret mode routes to the separate auto-pipelined kernel, so without
    this test the kernel that actually runs on hardware is never exercised
    by the suite (the scoring epilogue is shared — _score_epilogue — but the
    DMA data movement is not). Skipped on the CPU mesh; run on a TPU via
    `pytest tests/test_graph_ann.py -k dma` with JAX_PLATFORMS unset."""
    import jax

    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("manual-DMA kernel requires a real TPU")
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import graph_pallas as gp

    rng = np.random.RandomState(3)
    n_nodes, d, deg, e, q_n = 128, 256, 30, 4, 8
    db = rng.randn(n_nodes, d).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    graph = rng.randint(0, n_nodes, (n_nodes, deg)).astype(np.int32)
    graph[::5, -3:] = -1
    deg_p = gp.pad_degree(deg)
    pv, pi, sc = gp.pack_neighbours(jnp.asarray(db), jnp.asarray(graph), deg_p)
    sel = rng.randint(0, n_nodes, (q_n, e)).astype(np.int32)
    queries = rng.randn(q_n, d).astype(np.float32)
    sims, nbrs = gp._beam_expand_dma(
        jnp.asarray(sel), jnp.asarray(queries), pv, pi, sc, deg_p
    )
    ref_s, ref_n = gp.beam_expand_reference(
        sel, queries, np.asarray(pv), np.asarray(pi), np.asarray(sc), deg_p
    )
    np.testing.assert_array_equal(np.asarray(nbrs), ref_n)
    np.testing.assert_allclose(
        np.asarray(sims)[:, :, :deg_p], ref_s[:, :, :deg_p], atol=1e-4
    )
