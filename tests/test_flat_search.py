import numpy as np
import pytest

from knn_for_homology_tpu.ops.flat_pallas import pallas_flat_topk
from knn_for_homology_tpu.ops.topk import streaming_topk
from knn_for_homology_tpu.search import FlatIndex, knn_search


def sim_matrix(db, queries, metric):
    db = db.astype(np.float64)
    q = queries.astype(np.float64)
    if metric == "cosine":
        db = db / np.linalg.norm(db, axis=1, keepdims=True)
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
        return q @ db.T
    if metric == "ip":
        return q @ db.T
    if metric == "l2":
        return -(
            (q**2).sum(1)[:, None] + (db**2).sum(1)[None, :] - 2 * q @ db.T
        )
    raise ValueError(metric)


def brute_force(db, queries, k, metric):
    sims = sim_matrix(db, queries, metric)
    return np.argsort(-sims, axis=1, kind="stable")[:, :k]


def assert_topk_equivalent(db, q, ids, k, metric, tol=1e-5):
    """The engine runs in fp32, the oracle in fp64 — near-ties may swap rank.
    Assert the *similarity values* of the returned ids match the true top-k
    values within tol, and that no non-top-k id sneaked in."""
    sims = sim_matrix(db, q, metric)
    expected_vals = -np.sort(-sims, axis=1)[:, :k]
    got_vals = np.take_along_axis(sims, ids, axis=1)
    np.testing.assert_allclose(got_vals, expected_vals, atol=tol, rtol=tol)
    # no duplicate ids per row
    for row in ids:
        assert len(set(row.tolist())) == len(row)


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_streaming_topk_matches_bruteforce(metric):
    rng = np.random.RandomState(3)
    db = rng.randn(237, 48).astype(np.float32)
    q = rng.randn(41, 48).astype(np.float32)
    index = FlatIndex(metric=metric)
    index.add(db)
    scores, ids = index.search(q, 7)
    assert_topk_equivalent(db, q, ids, 7, metric)
    # score conventions: l2 ascending squared distances, others descending
    if metric == "l2":
        assert np.all(np.diff(scores, axis=1) >= -1e-5)
        assert np.all(scores >= -1e-4)
    else:
        assert np.all(np.diff(scores, axis=1) <= 1e-5)


def test_streaming_topk_multiple_tiles():
    rng = np.random.RandomState(4)
    db = rng.randn(1000, 16).astype(np.float32)
    q = rng.randn(17, 16).astype(np.float32)
    import jax.numpy as jnp

    sims, ids = streaming_topk(jnp.asarray(db), jnp.asarray(q), 13, "ip", db_tile=128)
    assert_topk_equivalent(db, q, np.asarray(ids), 13, "ip")


def test_k_larger_than_db_pads_with_minus_one():
    rng = np.random.RandomState(5)
    db = rng.randn(6, 8).astype(np.float32)
    q = rng.randn(3, 8).astype(np.float32)
    index = FlatIndex(metric="ip").add(db)
    scores, ids = index.search(q, 10)
    assert ids.shape == (3, 10)
    assert np.all(ids[:, 6:] == -1)
    assert np.all(np.isinf(scores[:, 6:]))


def test_search_self_strips_self_hit():
    rng = np.random.RandomState(6)
    db = rng.randn(30, 12).astype(np.float32)
    index = FlatIndex(metric="cosine").add(db)
    ids, scores = index.search_self(5)
    assert ids.shape == (30, 5)
    # the self hit (identical vector, cosine 1.0) must not appear
    assert not np.any(ids == np.arange(30)[:, None])


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_pallas_kernel_matches_streaming(metric):
    rng = np.random.RandomState(7)
    db = rng.randn(300, 32).astype(np.float32)
    q = rng.randn(19, 32).astype(np.float32)
    import jax.numpy as jnp

    if metric == "cosine":
        dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    else:
        dbn, qn = db, q
    vals_p, ids_p = pallas_flat_topk(
        jnp.asarray(dbn), jnp.asarray(qn), 9, metric=metric, db_tile=128, query_block=8
    )
    vals_x, ids_x = streaming_topk(jnp.asarray(dbn), jnp.asarray(qn), 9, metric)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_x), rtol=1e-5)


def test_knn_search_api(synthetic_dataset):
    from knn_for_homology_tpu.data import Dataset
    from knn_for_homology_tpu.eval import evaluate_rows

    ds = Dataset.from_dir(synthetic_dataset, hits=6)
    ids, scores, seconds = knn_search(ds.load_train(), ds.load_test(), ds.hits)
    auc1s, tps = evaluate_rows(ds, ids)
    # clusters are well separated: everything should be found perfectly
    assert np.mean(auc1s) == 1.0
    assert np.mean(tps) == 1.0
    assert seconds >= 0
