import numpy as np
import pytest

from knn_for_homology_tpu.search import (
    FlatIndex,
    LSHIndex,
    knn_search,
    read_index,
    write_index,
)


def test_lsh_recall_on_clustered_data(synthetic_dataset):
    from knn_for_homology_tpu.data import Dataset
    from knn_for_homology_tpu.eval import evaluate_rows

    ds = Dataset.from_dir(synthetic_dataset, hits=6)
    index = LSHIndex(dim=32, nbits=256).add(ds.load_train())
    dist, ids = index.search(ds.load_test(), 6)
    auc1s, tps = evaluate_rows(ds, ids)
    # well-separated clusters: 256-bit sketches must find the families
    assert np.mean(tps) > 0.95
    assert np.all(np.diff(dist, axis=1) >= 0)  # ascending Hamming


def test_lsh_agrees_with_exact_at_high_bits():
    rng = np.random.RandomState(21)
    db = rng.randn(400, 64).astype(np.float32)
    q = rng.randn(25, 64).astype(np.float32)
    exact = FlatIndex(metric="cosine").add(db)
    _, exact_ids = exact.search(q, 10)
    lsh = LSHIndex(dim=64, nbits=2048).add(db)
    _, lsh_ids = lsh.search(q, 10)
    # 2048 bits at d=64: top-10 should overlap heavily with exact cosine
    overlap = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(exact_ids, lsh_ids)
        ]
    )
    assert overlap > 0.6


def test_lsh_persistence_roundtrip(tmp_path):
    rng = np.random.RandomState(22)
    db = rng.randn(100, 32).astype(np.float32)
    q = rng.randn(7, 32).astype(np.float32)
    index = LSHIndex(dim=32, nbits=128).add(db)
    dist1, ids1 = index.search(q, 5)
    path = tmp_path / "index.bin"
    write_index(index, path)
    assert path.exists()
    loaded = read_index(path)
    dist2, ids2 = loaded.search(q, 5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_array_equal(dist1, dist2)


def test_flat_persistence_roundtrip(tmp_path):
    rng = np.random.RandomState(23)
    db = rng.randn(60, 16).astype(np.float32)
    q = rng.randn(5, 16).astype(np.float32)
    index = FlatIndex(metric="l2").add(db)
    s1, ids1 = index.search(q, 4)
    write_index(index, tmp_path / "flat.idx")
    loaded = read_index(tmp_path / "flat.idx")
    s2, ids2 = loaded.search(q, 4)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_create_index_cli(synthetic_dataset):
    # reference: tests/test_utils.py:17-21
    from knn_for_homology_tpu.search.cli import create_index_main

    index_path = synthetic_dataset / "index.bin"
    create_index_main(
        ["--dir", str(synthetic_dataset), "--index", str(index_path), "--param", "128"]
    )
    assert index_path.exists()
    loaded = read_index(index_path)
    # searching through the generic knn_search entry with a prebuilt index
    q = np.load(synthetic_dataset / "test.npy")
    ids, scores, _ = knn_search(loaded, q, hits=5)
    assert ids.shape == (q.shape[0], 5)


@pytest.mark.parametrize(
    "extra, kind",
    [
        (["--kind", "graph", "--param", "32"], "GraphIndex"),
        (["--kind", "ivf", "--param", "256"], "IVFIndex"),
        (["--kind", "ivf", "--param", "256", "--lean"], "IVFIndex"),
    ],
)
def test_create_index_cli_kinds(synthetic_dataset, extra, kind):
    """--kind exposes the graph and IVF (incl. lean int8-slab) builds
    through the same persist-then-search contract as the reference's
    LSH-only script."""
    from knn_for_homology_tpu.search.cli import create_index_main

    index_path = synthetic_dataset / "index.bin"
    create_index_main(
        ["--dir", str(synthetic_dataset), "--index", str(index_path)]
        + extra
    )
    loaded = read_index(index_path)
    assert type(loaded).__name__ == kind
    if "--lean" in extra:
        assert loaded._db is None
    q = np.load(synthetic_dataset / "test.npy")
    ids, scores, _ = knn_search(loaded, q, hits=5)
    assert ids.shape == (q.shape[0], 5)
    # the fixture's families are well separated: top-1 self-family hit
    assert (ids[:, 0] >= 0).all()


def test_graph_persistence_keeps_search_settings(tmp_path):
    """iters/build must round-trip (a restored index must search with the
    same iteration budget it was saved with)."""
    from knn_for_homology_tpu.search import GraphIndex

    rng = np.random.RandomState(60)
    db = rng.randn(120, 16).astype(np.float32)
    index = GraphIndex(metric="cosine", degree=8, beam_width=32, iters=64).add(db)
    write_index(index, tmp_path / "g.idx")
    loaded = read_index(tmp_path / "g.idx")
    assert loaded.iters == 64
    assert loaded.build == "auto"


def test_sharded_flat_k_exceeds_ntotal():
    from knn_for_homology_tpu.parallel import ShardedFlatIndex, make_pod_mesh

    rng = np.random.RandomState(61)
    db = rng.randn(30, 8).astype(np.float32)
    mesh = make_pod_mesh(n_ici=4, n_dcn=2)
    index = ShardedFlatIndex(mesh, metric="cosine").add(db).finalize()
    scores, ids = index.search(rng.randn(3, 8).astype(np.float32), 50)
    assert ids.shape == (3, 50)
    assert np.all(ids[:, 30:] == -1)


def test_flat_search_empty_queries():
    rng = np.random.RandomState(62)
    index = FlatIndex(metric="ip").add(rng.randn(10, 4).astype(np.float32))
    scores, ids = index.search(np.zeros((0, 4), np.float32), 3)
    assert scores.shape == (0, 3)
    assert ids.shape == (0, 3)


def test_cached_array_non_npy_suffix(tmp_path):
    from knn_for_homology_tpu.utils.artifacts import cached_array

    calls = []

    def compute():
        calls.append(1)
        return np.arange(4)

    out1 = cached_array(tmp_path / "hits.dat", compute)
    out2 = cached_array(tmp_path / "hits.dat", compute)
    np.testing.assert_array_equal(out1, out2)
    assert len(calls) == 1  # the exact-name file must be found again


def test_create_index_cli_lean_requires_ivf(tmp_path):
    """--lean with a non-ivf kind is a loud usage error, not ignored."""
    import pytest

    from knn_for_homology_tpu.search.cli import create_index_main

    rng = np.random.RandomState(3)
    np.save(tmp_path / "train.npy", rng.randn(32, 16).astype(np.float32))
    with pytest.raises(SystemExit):
        create_index_main(
            [
                "--dir", str(tmp_path),
                "--index", str(tmp_path / "x.npz"),
                "--kind", "lsh", "--lean",
            ]
        )
