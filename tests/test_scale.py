"""Sharded streaming index + pod meshes on the 8-device virtual mesh."""

import numpy as np
import pytest

from knn_for_homology_tpu.parallel import (
    ShardedFlatIndex,
    make_pod_mesh,
    stream_add,
)
from knn_for_homology_tpu.search import FlatIndex


@pytest.fixture(scope="module")
def pod_mesh():
    return make_pod_mesh(n_ici=4, n_dcn=2)


def test_pod_mesh_shape(pod_mesh):
    assert pod_mesh.shape["dcn"] == 2
    assert pod_mesh.shape["data"] == 4


def test_sharded_index_matches_single_device(pod_mesh):
    rng = np.random.RandomState(41)
    db = rng.randn(333, 32).astype(np.float32)
    q = rng.randn(19, 32).astype(np.float32)
    exact = FlatIndex(metric="cosine").add(db)
    want_scores, want_ids = exact.search(q, 9)

    index = ShardedFlatIndex(pod_mesh, metric="cosine")
    # streaming add in uneven chunks
    index.add(db[:100]).add(db[100:250]).add(db[250:]).finalize()
    scores, ids = index.search(q, 9)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(scores, want_scores, rtol=1e-5, atol=1e-6)


def test_stream_add_iterator(pod_mesh):
    rng = np.random.RandomState(42)
    db = rng.randn(100, 16).astype(np.float32)
    index = stream_add(
        ShardedFlatIndex(pod_mesh, metric="l2"),
        (db[i : i + 17] for i in range(0, 100, 17)),
    )
    assert index.ntotal == 100
    scores, ids = index.search(db[:5], 1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(5))  # self is nearest
    assert np.all(scores[:, 0] < 1e-5)  # squared distance to self ≈ 0


def test_shard_spill_roundtrip(pod_mesh, tmp_path):
    rng = np.random.RandomState(43)
    db = rng.randn(64, 16).astype(np.float32)
    q = rng.randn(7, 16).astype(np.float32)
    index = ShardedFlatIndex(pod_mesh, metric="cosine").add(db).finalize()
    s1, i1 = index.search(q, 5)
    index.save_shards(tmp_path / "shards")
    assert len(list((tmp_path / "shards").glob("shard_*.npz"))) == 8
    loaded = ShardedFlatIndex.load_shards(tmp_path / "shards", pod_mesh)
    s2, i2 = loaded.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_sharded_graph_index(pod_mesh):
    """Per-shard graph ANN + ICI winner merge ≈ global exact search."""
    from knn_for_homology_tpu.parallel import ShardedGraphIndex

    rng = np.random.RandomState(44)
    n, d = 800, 32
    fams = np.repeat(np.arange(20), 40)
    db = ((rng.randn(20, d) * 8)[fams] + rng.randn(n, d)).astype(np.float32)
    q = db[:32] + rng.randn(32, d).astype(np.float32) * 0.1
    exact = FlatIndex(metric="cosine").add(db)
    _, want_ids = exact.search(q, 10)

    index = ShardedGraphIndex(
        pod_mesh, metric="cosine", degree=16, beam_width=64
    ).build(db)
    scores, ids = index.search(q, 10)
    assert ids.shape == (32, 10)
    assert np.all(ids < n)
    recall = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(ids, want_ids)
        ]
    )
    assert recall > 0.9, recall
    # scores descending cosine
    assert np.all(np.diff(scores, axis=1) <= 1e-5)


def test_shard_sweep_one_chip(tmp_path):
    """ShardSweep: spill shards, sweep them sequentially, merge winners —
    ids must match a global exact search (VERDICT r1 #10 rehearsal path)."""
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.topk import flat_topk
    from knn_for_homology_tpu.parallel.scale import ShardSweep

    rng = np.random.RandomState(0)
    shards, rows, d, k = 3, 256, 32, 5
    chunks = [
        (rng.randn(rows, d) / np.sqrt(d)).astype(np.float32)
        for _ in range(shards)
    ]
    sweep = ShardSweep(
        tmp_path / "shards", degree=12, beam_width=64, expand=8, iters=8
    )
    for c in chunks:
        secs = sweep.build_shard(c)
        assert secs > 0
    assert sweep.ntotal == shards * rows
    queries = chunks[1][:17] + 0.01 * rng.randn(17, d).astype(np.float32)
    scores, ids, shard_secs = sweep.search(queries, k)
    assert len(shard_secs) == shards
    assert scores.shape == (17, k) and ids.shape == (17, k)

    # exact global ground truth over the normalised concatenation
    db = np.concatenate(chunks)
    db = db / np.linalg.norm(db, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    _, gt = flat_topk(jnp.asarray(db), jnp.asarray(qn), k)
    gt = np.asarray(gt)
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / k for i in range(len(ids))
    ])
    assert recall > 0.9, recall
    # merged scores descend and ids are global
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert ids.max() < shards * rows and ids.min() >= 0


def test_sharded_lsh_bit_identical_to_single_chip(pod_mesh):
    """ShardedLSHIndex must be BIT-identical to the single-chip LSHIndex:
    Hamming distances are exact integers and both paths break ties by
    ascending global id (VERDICT r3 next-round #7)."""
    from knn_for_homology_tpu.parallel import ShardedLSHIndex
    from knn_for_homology_tpu.search.lsh import LSHIndex

    rng = np.random.RandomState(17)
    db = rng.randn(333, 32).astype(np.float32)
    q = rng.randn(23, 32).astype(np.float32)
    single = LSHIndex(dim=32, nbits=128).add(db)
    want_dist, want_ids = single.search(q, 9)

    index = ShardedLSHIndex(pod_mesh, dim=32, nbits=128)
    # streaming add in uneven chunks, same contract as ShardedFlatIndex
    index.add(db[:100]).add(db[100:250]).add(db[250:]).finalize()
    dist, ids = index.search(q, 9)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_array_equal(dist, want_dist)

    # k > ntotal: FAISS-style inf/-1 padding, like the single-chip index
    dist_big, ids_big = index.search(q[:3], 340)
    want_big_d, want_big_i = single.search(q[:3], 340)
    np.testing.assert_array_equal(ids_big, want_big_i)
    np.testing.assert_array_equal(dist_big, want_big_d)


def test_sharded_flat_index_sq8_storage():
    # int8 shard scans: self-hits win, recall vs the native path in band
    import jax

    from knn_for_homology_tpu.parallel.mesh import make_mesh
    from knn_for_homology_tpu.parallel.scale import ShardedFlatIndex

    mesh = make_mesh(jax.device_count())
    rng = np.random.RandomState(5)
    db = rng.randn(700, 128).astype(np.float32)
    ref = ShardedFlatIndex(mesh, metric="cosine").add(db).finalize()
    sq8 = ShardedFlatIndex(mesh, metric="cosine", storage="sq8-sym").add(
        db
    ).finalize()
    s_ref, i_ref = ref.search(db[:40], 20)
    s_sq8, i_sq8 = sq8.search(db[:40], 20)
    np.testing.assert_array_equal(i_sq8[:, 0], np.arange(40))
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 20
            for a, b in zip(i_sq8, i_ref)
        ]
    )
    assert rec >= 0.95


def test_sharded_ivf_index_recall_and_global_ids():
    # per-shard inverted files + ICI merge: recall vs the exact scan in
    # band, global ids valid, self-hits on top (clustered so routing works)
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.topk import flat_topk
    from knn_for_homology_tpu.parallel.mesh import make_mesh
    from knn_for_homology_tpu.parallel.scale import ShardedIVFIndex

    rng = np.random.RandomState(9)
    centers = rng.randn(32, 64).astype(np.float32)
    assign = rng.randint(0, 32, 1030)
    db = centers[assign] + 0.08 * rng.randn(1030, 64).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    mesh = make_mesh(jax.device_count())
    index = ShardedIVFIndex(mesh, metric="cosine", nprobe=8).build(db)
    queries = db[:64]
    scores, ids = index.search(queries, 10)
    assert ids.shape == (64, 10)
    assert ids.max() < 1030 and (ids >= -1).all()
    np.testing.assert_array_equal(ids[:, 0], np.arange(64))
    _, exact_ids = flat_topk(jnp.asarray(db), jnp.asarray(queries), 10)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(ids, np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.9


@pytest.mark.parametrize("rescore", [True, False])
def test_sharded_ivf_union_budget_mode(rescore):
    """union_budget > 0 replaces per-query DMA expansion with the
    fixed-budget union scan inside shard_map (fully traced, no host
    syncs). A budget covering every cell makes each shard's scan a
    superset of the DMA path's candidates — recall must hold and
    self-hits stay on top; global id mapping is shared with the DMA
    epilogue."""
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.topk import flat_topk
    from knn_for_homology_tpu.parallel.mesh import make_mesh
    from knn_for_homology_tpu.parallel.scale import ShardedIVFIndex

    rng = np.random.RandomState(11)
    centers = rng.randn(32, 64).astype(np.float32)
    assign = rng.randint(0, 32, 1030)
    db = centers[assign] + 0.08 * rng.randn(1030, 64).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    mesh = make_mesh(jax.device_count())
    index = ShardedIVFIndex(
        mesh, metric="cosine", nprobe=8, rescore=rescore,
        union_budget=4096,  # >= per-shard cells: full coverage
    ).build(db)
    queries = db[:64]
    scores, ids = index.search(queries, 10)
    assert ids.shape == (64, 10)
    assert ids.max() < 1030 and (ids >= -1).all()
    if rescore:
        # fp32 rescore puts the exact self-hit on top and holds recall;
        # without it the union buffer's bf16 dequantised scores carry
        # double quantisation noise (int8 + bf16 matmul) — measured
        # recall@10 ~0.5 on this tight-cluster set vs the DMA kernel's
        # ~0.73 — so small-k quality claims are rescore-mode only (the
        # single-chip IVFIndex defaults rescore on for exactly this)
        np.testing.assert_array_equal(ids[:, 0], np.arange(64))
        _, exact_ids = flat_topk(jnp.asarray(db), jnp.asarray(queries), 10)
        rec = np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / 10
                for a, b in zip(ids, np.asarray(exact_ids))
            ]
        )
        assert rec >= 0.9
    # a tiny budget still returns valid results (graceful degradation)
    small = ShardedIVFIndex(
        mesh, metric="cosine", nprobe=4, rescore=rescore, union_budget=2,
    ).build(db)
    s2, i2 = small.search(queries, 10)
    assert i2.shape == (64, 10)
    assert (i2 < 1030).all() and (i2 >= -1).all()


def test_shard_sweep_ivf(tmp_path):
    """ShardSweep(index='ivf'): lean int8 IVF shards through the same
    spill/sweep/merge contract as the graph shards (the equal-memory
    sub-linear mode for the UniRef90-scale rehearsal)."""
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.topk import flat_topk
    from knn_for_homology_tpu.parallel.scale import ShardSweep

    rng = np.random.RandomState(1)
    shards, rows, d, k = 3, 256, 32, 5
    chunks = [
        (rng.randn(rows, d) / np.sqrt(d)).astype(np.float32)
        for _ in range(shards)
    ]
    sweep = ShardSweep(tmp_path / "shards", index="ivf", nprobe=8)
    for c in chunks:
        assert sweep.build_shard(c) > 0
    assert sweep.ntotal == shards * rows
    # lean layout on disk: no fp32 vectors in the shard files
    import numpy as _np

    with _np.load(sweep._path(0), allow_pickle=False) as data:
        assert "vectors" not in data.files
        assert "packed_vecs" in data.files
    queries = chunks[1][:17] + 0.01 * rng.randn(17, d).astype(np.float32)
    scores, ids, shard_secs = sweep.search(queries, k)
    assert len(shard_secs) == shards
    db = np.concatenate(chunks)
    db = db / np.linalg.norm(db, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    _, gt = flat_topk(jnp.asarray(db), jnp.asarray(qn), k)
    gt = np.asarray(gt)
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / k for i in range(len(ids))
    ])
    assert recall > 0.9, recall
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert ids.max() < shards * rows and ids.min() >= 0
