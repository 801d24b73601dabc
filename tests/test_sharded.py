"""Sharded search must reproduce the single-device neighbour lists
bit-identically (SURVEY.md §4: the distributed tests the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knn_for_homology_tpu.ops.topk import streaming_topk
from knn_for_homology_tpu.parallel import (
    db_sharded_topk,
    make_mesh,
    query_sharded_topk,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    return make_mesh(8)


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_db_sharded_matches_single_device(mesh8, metric):
    rng = np.random.RandomState(11)
    db = rng.randn(530, 64).astype(np.float32)
    q = rng.randn(37, 64).astype(np.float32)
    if metric == "cosine":
        db = db / np.linalg.norm(db, axis=1, keepdims=True)
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
    ref_sims, ref_ids = streaming_topk(jnp.asarray(db), jnp.asarray(q), 13, metric)
    sims, ids = db_sharded_topk(jnp.asarray(db), jnp.asarray(q), 13, mesh8, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(sims), np.asarray(ref_sims), rtol=1e-6)


def test_query_sharded_matches_single_device(mesh8):
    rng = np.random.RandomState(12)
    db = rng.randn(200, 32).astype(np.float32)
    q = rng.randn(99, 32).astype(np.float32)  # not divisible by 8
    ref_sims, ref_ids = streaming_topk(jnp.asarray(db), jnp.asarray(q), 7, "ip")
    sims, ids = query_sharded_topk(jnp.asarray(db), jnp.asarray(q), 7, mesh8, metric="ip")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(sims), np.asarray(ref_sims), rtol=1e-6)


def test_db_sharded_uneven_rows(mesh8):
    # N not divisible by the axis size: padded rows must never win
    rng = np.random.RandomState(13)
    db = rng.randn(101, 16).astype(np.float32)
    q = rng.randn(9, 16).astype(np.float32)
    ref_sims, ref_ids = streaming_topk(jnp.asarray(db), jnp.asarray(q), 5, "ip")
    sims, ids = db_sharded_topk(jnp.asarray(db), jnp.asarray(q), 5, mesh8, metric="ip")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    assert np.all(np.asarray(ids) < 101)


def test_db_sharded_k_exceeds_database(mesh8):
    rng = np.random.RandomState(14)
    db = rng.randn(20, 8).astype(np.float32)
    q = rng.randn(3, 8).astype(np.float32)
    sims, ids = db_sharded_topk(jnp.asarray(db), jnp.asarray(q), 50, mesh8, metric="ip")
    assert ids.shape == (3, 50)
    ids = np.asarray(ids)
    assert np.all(ids[:, 20:] == -1)
    # first 20 are the whole database
    for row in ids[:, :20]:
        assert sorted(row.tolist()) == list(range(20))


@pytest.mark.parametrize("approx", [False, True])
def test_db_sharded_pallas_route_matches_single_device(
    mesh8, monkeypatch, approx
):
    """KNN_TPU_SHARDED_PALLAS=always routes the shard-local selection
    through the traced segment-top-R kernel (interpret mode on this CPU
    mesh) — the default-on production path on TPU (VERDICT r2 #2). Exact
    must stay bit-identical to the single-device result; approx (the
    packed int32 kernel) must return valid ids at high recall."""
    monkeypatch.setenv("KNN_TPU_SHARDED_PALLAS", "always")
    rng = np.random.RandomState(21)
    db = rng.randn(530, 128).astype(np.float32)  # d % 128 == 0, k > 32
    q = rng.randn(24, 128).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k = 48
    ref_sims, ref_ids = streaming_topk(jnp.asarray(db), jnp.asarray(q), k, "ip")
    sims, ids = db_sharded_topk(
        jnp.asarray(db), jnp.asarray(q), k, mesh8, metric="ip", approx=approx
    )
    if approx:
        recall = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(np.asarray(ids), np.asarray(ref_ids))
        ])
        assert recall >= 0.9
        assert np.asarray(ids).max() < 530
    else:
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
        np.testing.assert_allclose(
            np.asarray(sims), np.asarray(ref_sims), rtol=1e-6
        )


def test_pallas_route_modes(monkeypatch):
    from knn_for_homology_tpu.parallel import sharded

    monkeypatch.setenv("KNN_TPU_SHARDED_PALLAS", "never")
    assert sharded._pallas_route_enabled() is False
    monkeypatch.setenv("KNN_TPU_SHARDED_PALLAS", "always")
    assert sharded._pallas_route_enabled() is True
    # auto on a non-TPU backend: no probe, no routing
    monkeypatch.setenv("KNN_TPU_SHARDED_PALLAS", "auto")
    monkeypatch.setattr(sharded, "_ROUTE_DECISION", None)
    assert sharded._pallas_route_enabled() is False


@pytest.mark.parametrize("storage", ["sq8", "sq8-sym"])
def test_db_sharded_sq8_finds_true_neighbours(mesh8, storage):
    # per-ROW quantisation is shard-local, so each row's sq8 SCORE is
    # identical sharded or not; the packed encoding's truncation bits
    # (jbits from the per-shard tile count) differ though, so tail
    # selection may legitimately diverge like any approx engine. Assert
    # the quality contract instead: self-hits win and recall vs the exact
    # scan stays in band.
    rng = np.random.RandomState(21)
    db = rng.randn(1030, 128).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = jnp.asarray(db[:64])
    db = jnp.asarray(db)
    k = 40
    sims, ids = db_sharded_topk(
        db, q, k, mesh8, metric="ip", approx=True, storage=storage
    )
    ids_np = np.asarray(ids)
    np.testing.assert_array_equal(ids_np[:, 0], np.arange(64))
    _, exact_ids = streaming_topk(db, q, k, "ip")
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(ids_np, np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.95


def test_query_sharded_sq8_matches_unsharded(mesh8):
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    rng = np.random.RandomState(22)
    db = rng.randn(512, 128).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = jnp.asarray(db[:48])  # not divisible by 8 after padding split
    db = jnp.asarray(db)
    k = 20
    ref_vals, ref_ids = packed_pallas_topk(
        db, q, k, metric="ip", storage="sq8-sym"
    )
    sims, ids = query_sharded_topk(
        db, q, k, mesh8, metric="ip", approx=True, storage="sq8-sym"
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_sharded_sq8_rejects_exact_mode(mesh8):
    db = jnp.zeros((64, 128), jnp.float32)
    q = jnp.zeros((8, 128), jnp.float32)
    with pytest.raises(ValueError, match="approx-only"):
        db_sharded_topk(db, q, 5, mesh8, approx=False, storage="sq8")
