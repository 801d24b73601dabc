"""IVF index: the TPU-native HNSW-class replacement (VERDICT r2 #3).

Same acceptance style as the graph ANN tests: recall vs the exact flat
engine on clustered data, persistence round-trip, edge shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from knn_for_homology_tpu.ops.topk import flat_topk
from knn_for_homology_tpu.search import IVFIndex, read_index, write_index


def _clustered(n, d, n_clusters, seed=0, scale=0.08):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d).astype(np.float32)
    assign = rng.randint(0, n_clusters, n)
    x = centers[assign] + scale * rng.randn(n, d).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_ivf_recall_clustered(metric):
    db = _clustered(2048, 128, 32)
    queries = db[:128]
    index = IVFIndex(metric=metric, nprobe=8).add(db)
    scores, ids = index.search(queries, 10)
    _, exact_ids = flat_topk(
        jnp.asarray(db), jnp.asarray(queries), 10, metric=metric
    )
    exact_ids = np.asarray(exact_ids)
    recall = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(ids, exact_ids)
        ]
    )
    assert recall >= 0.95, recall
    # rescored fp32 scores: self-query's top hit is itself at ~exact score
    assert ids[0, 0] == 0
    if metric == "cosine":
        np.testing.assert_allclose(scores[0, 0], 1.0, atol=1e-4)
    else:
        np.testing.assert_allclose(scores[0, 0], 0.0, atol=1e-4)


def test_ivf_large_k_covers_pool():
    """k near the database size: candidate pool (nprobe*capacity) must be
    raised to cover k and the tail padded with the FAISS sentinel."""
    db = _clustered(600, 64, 8, seed=3)
    index = IVFIndex(metric="cosine", nprobe=2).add(db)
    scores, ids = index.search(db[:16], 500)
    assert ids.shape == (16, 500)
    # every returned non-sentinel id is a valid row
    real = ids[ids >= 0]
    assert real.size and real.max() < 600
    # recall at large k on easy clustered data
    _, exact_ids = flat_topk(jnp.asarray(db), jnp.asarray(db[:16]), 500)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b[b >= 0].tolist())) / 500
            for a, b in zip(np.asarray(exact_ids), ids)
        ]
    )
    assert rec >= 0.9, rec


def test_ivf_every_row_stored_once():
    db = _clustered(700, 32, 11, seed=5)
    index = IVFIndex(metric="cosine").add(db)
    members = index._members[index._members >= 0]
    assert sorted(members.tolist()) == list(range(700))


def test_ivf_persistence_roundtrip(tmp_path):
    db = _clustered(512, 64, 8, seed=7)
    index = IVFIndex(metric="cosine", nprobe=4).add(db)
    s1, i1 = index.search(db[:32], 9)
    path = tmp_path / "ivf.index"
    write_index(index, path)
    loaded = read_index(path)
    assert isinstance(loaded, IVFIndex)
    s2, i2 = loaded.search(db[:32], 9)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_ivf_k_exceeds_database():
    db = _clustered(40, 32, 4, seed=9)
    index = IVFIndex(metric="cosine").add(db)
    scores, ids = index.search(db[:5], 64)
    assert ids.shape == (5, 64)
    assert (ids[:, 40:] == -1).all() or (ids == -1).sum() > 0


def test_ivf_tiny_database_single_cluster():
    db = _clustered(30, 32, 2, seed=11)
    index = IVFIndex(metric="cosine", n_clusters=1).add(db)
    scores, ids = index.search(db, 5)
    # one cluster holds <= 128 rows: search is exhaustive -> exact
    _, exact_ids = flat_topk(jnp.asarray(db), jnp.asarray(db), 5)
    np.testing.assert_array_equal(ids, np.asarray(exact_ids))


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_ivf_union_scan_matches_dma_path(metric):
    """Blocks >= UNION_MIN_Q take the batched union-scan path (gather the
    probed cells' slabs, scan with the flat engine); its results must be
    at least as good as the per-query DMA path's — every cell a query
    probes is in the union, so the union candidates are a superset."""
    db = _clustered(4096, 128, 64, seed=13)
    n_q = IVFIndex.UNION_MIN_Q
    queries = db[:n_q]
    index = IVFIndex(metric=metric, nprobe=4).add(db)
    s_union, i_union = index.search(queries, 10)  # n_q >= UNION_MIN_Q
    # force the DMA path by searching one small chunk at a time
    half = n_q // 2
    s_dma = np.concatenate(
        [index.search(queries[:half], 10)[0],
         index.search(queries[half:], 10)[0]]
    )
    _, exact_ids = flat_topk(
        jnp.asarray(db), jnp.asarray(queries), 10, metric=metric
    )
    exact_ids = np.asarray(exact_ids)

    def recall(ids):
        return np.mean(
            [len(set(a.tolist()) & set(b[b >= 0].tolist())) / 10
             for a, b in zip(exact_ids, ids)]
        )

    r_union = recall(i_union)
    assert r_union >= 0.95, r_union
    # superset property: union-path top-1 score >= DMA top-1 score
    assert (s_union[:, 0] >= s_dma[:, 0] - 1e-4).all()
    # no capacity-padding rows leak into results (bias-lane knockout)
    valid = i_union >= 0
    assert valid[:, 0].all()


def test_ivf_union_scan_pad_rows_never_surface():
    """With k greater than the real candidate count, the engine must pad
    with sentinel -1/-inf instead of surfacing the zero pad rows that fill
    slabs to capacity."""
    db = _clustered(256, 64, 4, seed=17)
    index = IVFIndex(metric="cosine", nprobe=1, n_clusters=4).add(db)
    index.UNION_MIN_Q = 8  # force the union path at a tiny block
    scores, ids = index.search(db[:16], 200)
    real = ids >= 0
    # scores on sentinel slots are -inf, never the pad rows' bias value
    assert np.isneginf(scores[~real]).all()
    # all real ids valid and unique per row
    for row in ids:
        r = row[row >= 0]
        assert len(set(r.tolist())) == len(r)
        assert r.max() < 256


def test_ivf_route_sort_preserves_caller_order():
    """Multi-block host searches sort queries by routed cell internally
    (locality shrinks each block's cell union); the inverse permutation
    must restore caller order exactly — row i of the result always
    answers query i."""
    db = _clustered(2048, 64, 16, seed=23)
    index = IVFIndex(metric="cosine", nprobe=4).add(db)
    index.UNION_MIN_Q = 32
    index.QUERY_BLOCK = 64  # several blocks -> the sort path activates
    queries = db[:256]
    s_multi, i_multi = index.search(queries, 5)
    # golden: one query at a time (no sorting, no union path)
    index.QUERY_BLOCK = 4096
    index.UNION_MIN_Q = 10**9
    for qi in (0, 17, 128, 255):
        s_one, i_one = index.search(queries[qi : qi + 1], 5)
        np.testing.assert_array_equal(i_multi[qi], i_one[0])
        np.testing.assert_allclose(s_multi[qi], s_one[0], rtol=2e-3)


def test_ivf_union_budget_traces_under_jit():
    """A static union_budget removes the host sync that kept the
    union-scan path off traced callers: the whole search (locality sort
    included) must run inside jit and match the host-path results at a
    covering budget."""
    import jax

    db = _clustered(2048, 128, 32, seed=31)
    index = IVFIndex(metric="cosine", nprobe=8).add(db)
    queries = jnp.asarray(db[: IVFIndex.UNION_MIN_Q])
    c = int(index._centroids.shape[0])

    @jax.jit
    def run(q):
        return index.search_device(q, 10, union_budget=c)

    s_t, i_t = run(queries)
    assert i_t.shape == (queries.shape[0], 10)
    # host path with the same explicit budget: identical code path, so
    # ids match exactly (same blocking, same budget, same compile)
    s_h, i_h = index.search_device(queries, 10, union_budget=c)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_h))
    # and recall vs exact holds
    _, exact_ids = flat_topk(jnp.asarray(db), queries, 10)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(i_t), np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.95, rec


def test_ivf_grouped_scan_matches_per_block_fallback():
    """search_device dispatches same-budget blocks as ONE lax.scan
    (_union_scan_stacked); the direct per-block fallback
    (_union_scan_block) shares _union_scan_one, so on identically-sized
    blocks with identical budgets the two must agree everywhere except
    fp32-tie order (the scanned and standalone compilations may fuse the
    rescore einsum differently — reassociation flips exact ties).
    Queries are pre-sorted by routed cell so the internal locality sort
    is the identity (stable argsort of a sorted key) and rows line up."""
    from knn_for_homology_tpu.search.ivf import (
        CAPACITY, _block_union_counts, _route_sims,
    )

    db = _clustered(4096, 128, 64, seed=29)
    index = IVFIndex(metric="cosine", nprobe=4).add(db)
    index.UNION_MIN_Q = 32
    qb = index.QUERY_BLOCK = 64
    raw = db[:256]
    top1 = np.asarray(
        jnp.argmax(_route_sims(jnp.asarray(raw), index._centroids,
                               "cosine"), axis=1)
    )
    queries = raw[np.argsort(top1, kind="stable")]
    s_g, i_g = index.search(queries, 10)
    # per-block reference through the fallback, same blocking + budgets
    c = index._centroids.shape[0]
    nprobe = min(max(index.nprobe, -(-2 * 10 // CAPACITY)), c)
    q_blocks = jnp.asarray(queries).reshape(-1, qb, queries.shape[1])
    u_vec = np.asarray(
        _block_union_counts(q_blocks, index._centroids, "cosine", nprobe)[0]
    )
    shortlist = min(max(4 * 10, CAPACITY), nprobe * CAPACITY)
    for bi, u in enumerate(u_vec):
        budget = min(1 << max(int(u) - 1, 0).bit_length(), c)
        vals, ids = index._union_scan_block(
            q_blocks[bi], 10, nprobe, shortlist, True, budget=budget
        )
        ids = np.asarray(ids)
        vals = np.asarray(vals)
        got_i = i_g[bi * qb : (bi + 1) * qb]
        got_s = s_g[bi * qb : (bi + 1) * qb]
        # rescored score vectors must match to fp32 noise everywhere...
        np.testing.assert_allclose(got_s, vals, atol=2e-5)
        # ...and any id disagreement must be an exact-tie swap
        diff = got_i != ids
        assert diff.mean() < 0.01, diff.mean()
        np.testing.assert_allclose(
            got_s[diff], vals[diff], atol=2e-5
        )


def test_ivf_int8_union_scan_matches_bf16_union_scan():
    """Unions >= INT8_UNION_MIN_ROWS scan the gathered slabs as raw int8
    through the sq8-sym kernel (bias lane in integer form, pad scale
    knockout). CI shapes never reach the production threshold, so force
    it and check against the bf16 union scan and exact ids."""
    db = _clustered(2048, 128, 32, seed=3)
    queries = db[:IVFIndex.UNION_MIN_Q + 16]
    index = IVFIndex(metric="cosine", nprobe=8).add(db)
    index.INT8_UNION_MIN_ROWS = 10**9  # bf16 union path
    s_bf16, i_bf16 = index.search(queries, 10)
    index.INT8_UNION_MIN_ROWS = 1  # int8 union path
    s_int8, i_int8 = index.search(queries, 10)
    # both rescore the shortlist in fp32, so ids should agree wherever the
    # shortlists agree; demand near-total agreement plus exact recall
    agree = np.mean(i_bf16 == i_int8)
    assert agree >= 0.99
    _, exact_ids = flat_topk(jnp.asarray(db), jnp.asarray(queries), 10)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(i_int8, np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.95
    # self-hit survives the double-sided quantisation
    np.testing.assert_array_equal(i_int8[:, 0], np.arange(len(queries)))


def test_ivf_lean_matches_full_above_rescore_k():
    """store_fp32=False drops the fp32 rows after build. Above
    RESCORE_MAX_K neither mode rescores, and the build is deterministic,
    so full and lean results must be bit-identical there."""
    db = _clustered(600, 64, 8, seed=13)
    full = IVFIndex(metric="cosine", nprobe=4).add(db)
    lean = IVFIndex(metric="cosine", nprobe=4, store_fp32=False).add(db)
    assert lean._db is None and lean.ntotal == 600
    k = IVFIndex.RESCORE_MAX_K + 72
    s1, i1 = full.search(db[:16], k)
    s2, i2 = lean.search(db[:16], k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_ivf_lean_small_k_regret_and_no_incremental_add():
    """Lean mode at small k rescores from the DEQUANTISED slabs, so the
    caller-visible error is the int8 STORAGE quantisation (~0.0013 max
    dot error at d=128, measured). This synthetic data's rank-10/11
    score gaps are ~0.00003 — 40x below that floor — so recall-vs-exact
    is unmeasurable for ANY int8-storage index (FAISS SQ8 included); the
    honest criterion is score REGRET: every returned id's TRUE score
    must be within the storage-noise band of the exact k-th score. A
    second add() must fail loudly instead of silently rebuilding."""
    db = _clustered(2048, 128, 32, seed=15)
    k = 10
    lean = IVFIndex(metric="cosine", nprobe=8, store_fp32=False).add(db)
    _, ids = lean.search(db[:128], k)
    ids = np.asarray(ids)
    exact_vals, _ = flat_topk(jnp.asarray(db), jnp.asarray(db[:128]), k)
    kth = np.asarray(exact_vals)[:, -1]
    true_ret = np.einsum("qkd,qd->qk", db[ids], db[:128])
    regret = kth[:, None] - true_ret  # >0 only where a sub-kth id crept in
    assert regret.max() <= 4e-3, regret.max()
    # and the median returned id is a genuine top-k member (regret ~ 0)
    assert np.median(regret) <= 1e-5
    with pytest.raises(ValueError, match="lean"):
        lean.add(db[:10])


def test_ivf_lean_persistence_roundtrip(tmp_path):
    """The lean state persists the int8 slabs directly (bit-identical
    round trip; re-quantising a reconstruction would not be)."""
    db = _clustered(512, 64, 8, seed=17)
    index = IVFIndex(metric="cosine", nprobe=4, store_fp32=False).add(db)
    s1, i1 = index.search(db[:32], 9)
    path = tmp_path / "ivf_lean.index"
    write_index(index, path)
    loaded = read_index(path)
    assert isinstance(loaded, IVFIndex)
    assert loaded._db is None and loaded.ntotal == 512
    s2, i2 = loaded.search(db[:32], 9)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_route_prefs_blocked_matches_oneshot():
    """The blocked preference routing (which bounds the [rows, C]
    transient — the one-shot [N, C] matrix OOMed HBM at n=2^20/c=16k)
    must return exactly the one-shot top_k preferences, including when
    the block size forces padding."""
    import jax

    from knn_for_homology_tpu.search.ivf import (
        _route_prefs_blocked,
        _route_sims,
    )

    rng = np.random.RandomState(5)
    db = rng.randn(190, 32).astype(np.float32)  # 190 = 2*64 + 62 (pad)
    cents = rng.randn(16, 32).astype(np.float32)
    for metric in ("cosine", "l2"):
        want = jax.lax.top_k(
            _route_sims(jnp.asarray(db), jnp.asarray(cents), metric), 4
        )[1]
        got = _route_prefs_blocked(
            jnp.asarray(db), jnp.asarray(cents), metric, 4, 64
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("lean", [False, True])
def test_ivf_dma_chunked_rescore_matches_unchunked(lean, monkeypatch):
    """The per-probe DMA path's rescore must ride _map_rescore too: the
    unchunked [qb, shortlist, d] dequant transient is ~8 GB at
    qb=4096/k=100/d=1024 and OOMed one v5e chip next to a 2^22-row slab
    table (benchmarks/r5_campaigns.md §8). Forcing a tiny chunk budget,
    results are BIT-identical to the single-dispatch rescore."""
    from knn_for_homology_tpu.search import ivf as ivf_mod

    db = _clustered(2048, 128, 32, seed=11)
    q = jnp.asarray(db[:96])  # non-pow2 vs chunk: exercises the pad path
    index = IVFIndex(
        metric="cosine", nprobe=8, rescore_max_k=64, store_fp32=not lean
    ).add(db)
    k_eff, nprobe, rescore, shortlist, _, _ = index.plan_blocks(32)
    assert rescore == ("slab" if lean else "db")
    pv, pi, sc = index._packed
    args = (
        q, index._centroids, pv, pi, sc, index._row_sq_arg(),
        index._db_arg(), index._slot_arg(),
    )
    kw = dict(
        metric="cosine", k_eff=k_eff, nprobe=nprobe, shortlist=shortlist,
        rescore=rescore, max_probe=index.MAX_PROBE_PER_CALL,
        route_approx=index._route_approx(), interpret=True,
    )
    vals_1, ids_1 = ivf_mod._dma_block_one(*args, **kw)
    monkeypatch.setattr(ivf_mod, "_RESCORE_CHUNK_BYTES", 1)
    vals_c, ids_c = ivf_mod._dma_block_one(*args, **kw)
    np.testing.assert_array_equal(np.asarray(vals_c), np.asarray(vals_1))
    np.testing.assert_array_equal(np.asarray(ids_c), np.asarray(ids_1))


@pytest.mark.parametrize("lean", [False, True])
def test_ivf_chunked_rescore_matches_unchunked(lean, monkeypatch):
    """_map_rescore (the qb-independent transient bound) must be a pure
    refactor: forcing a tiny chunk budget so the lax.map path runs at
    test scale, results are BIT-identical to the single-dispatch rescore
    (same gathers, same einsum, just sub-block mapped)."""
    from knn_for_homology_tpu.search import ivf as ivf_mod

    db = _clustered(2048, 128, 32, seed=11)
    q = jnp.asarray(db[:96])  # non-pow2 vs chunk: exercises the pad path
    index = IVFIndex(
        metric="cosine", nprobe=8, rescore_max_k=64, store_fp32=not lean
    ).add(db)
    k_eff, nprobe, rescore, shortlist, _, _ = index.plan_blocks(32)
    assert rescore == ("slab" if lean else "db")
    monkeypatch.setattr(ivf_mod, "_MATMUL_RESCORE_BUF_MAX", 0)
    vals_1, ids_1 = index._union_scan_block(
        q, k_eff, nprobe, shortlist, rescore
    )
    monkeypatch.setattr(ivf_mod, "_RESCORE_CHUNK_BYTES", 1)
    vals_c, ids_c = index._union_scan_block(
        q, k_eff, nprobe, shortlist, rescore
    )
    np.testing.assert_array_equal(np.asarray(vals_c), np.asarray(vals_1))
    np.testing.assert_array_equal(np.asarray(ids_c), np.asarray(ids_1))


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_ivf_matmul_rescore_matches_row_gather(metric, monkeypatch):
    """The union-matmul fp32 rescore (ONE [budget*lane, d] union gather +
    MXU scores picked by buffer position) must reproduce the
    per-(query, candidate) row-gather rescore: same fp32 rows, same
    einsum class — scores to fp32 noise, id disagreements only at
    exact-tie swaps (einsum reassociation)."""
    from knn_for_homology_tpu.search import ivf as ivf_mod

    db = _clustered(2048, 128, 32, seed=7)
    q = jnp.asarray(db[:64])
    index = IVFIndex(metric=metric, nprobe=8, rescore_max_k=64).add(db)
    k_eff, nprobe, rescore, shortlist, _, _ = index.plan_blocks(32)
    assert rescore == "db"
    vals_m, ids_m = index._union_scan_block(
        q, k_eff, nprobe, shortlist, rescore
    )
    assert ivf_mod._MATMUL_RESCORE_BUF_MAX > 0  # matmul path was active
    monkeypatch.setattr(ivf_mod, "_MATMUL_RESCORE_BUF_MAX", 0)
    vals_g, ids_g = index._union_scan_block(
        q, k_eff, nprobe, shortlist, rescore
    )
    vals_m, ids_m = np.asarray(vals_m), np.asarray(ids_m)
    vals_g, ids_g = np.asarray(vals_g), np.asarray(ids_g)
    np.testing.assert_allclose(vals_m, vals_g, atol=2e-5)
    diff = ids_m != ids_g
    assert diff.mean() < 0.01, diff.mean()
    np.testing.assert_allclose(vals_m[diff], vals_g[diff], atol=2e-5)


def test_ivf_streamed_build_matches_lean_inmemory():
    """add_chunks with one whole-corpus chunk and stride-1 sampling
    (kmeans_sample >= n) runs the exact same device ops as the in-memory
    lean add(): bit-identical slabs, members, and search results. (With
    MULTIPLE chunks the per-chunk routing matmuls tile differently and
    near-tie preferences may flip — covered by the recall test below.)"""
    db = _clustered(2048, 96, 32, seed=11)
    ref = IVFIndex(metric="cosine", nprobe=8, store_fp32=False).add(db)

    idx = IVFIndex(metric="cosine", nprobe=8, store_fp32=False).add_chunks(
        lambda: [db], n_total=2048, kmeans_sample=4096
    )
    pv_i, pi_i, sc_i = (np.asarray(a) for a in idx._packed)
    pv_r, pi_r, sc_r = (np.asarray(a) for a in ref._packed)
    np.testing.assert_array_equal(pv_i, pv_r)
    np.testing.assert_array_equal(pi_i, pi_r)
    # scales may differ 1 ulp: quantize_int8 fuses into the pack jit on
    # the in-memory path but runs standalone per chunk on the streamed one
    np.testing.assert_allclose(sc_i, sc_r, rtol=3e-7)
    np.testing.assert_array_equal(
        np.asarray(idx._members), np.asarray(ref._members)
    )
    s_i, i_i = idx.search(db[:64], 10)
    s_r, i_r = ref.search(db[:64], 10)
    np.testing.assert_array_equal(i_i, i_r)
    np.testing.assert_allclose(s_i, s_r, rtol=1e-5, atol=1e-6)


def test_ivf_streamed_build_subsampled_kmeans_recall():
    """The production setting (kmeans on a strided subsample, uneven tail
    chunk, l2 metric exercises the row_sq path) still recalls."""
    db = _clustered(2048, 96, 32, seed=13, scale=0.45)

    def chunks():
        yield db[:900]
        yield db[900:1800]
        yield db[1800:]

    # scale=0.45: resolvable top-10 gaps — the tight scale=0.08 default
    # makes within-cluster sims near-ties BELOW the int8 storage noise, a
    # known lean-mode floor (any lean/no-rescore index recalls ~0.6 there,
    # fp32 rescore or not streamed alike)
    idx = IVFIndex(metric="l2", nprobe=8, store_fp32=False).add_chunks(
        chunks, n_total=2048, kmeans_sample=512
    )
    _, ids = idx.search(db[:128], 10)
    _, exact_ids = flat_topk(
        jnp.asarray(db), jnp.asarray(db[:128]), 10, metric="l2"
    )
    exact_ids = np.asarray(exact_ids)
    rec = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(ids, exact_ids)
    ])
    assert rec >= 0.9, rec
    # errors surfaced: wrong n_total, double-build, fp32 mode
    with pytest.raises(ValueError, match="yielded"):
        IVFIndex(store_fp32=False).add_chunks(chunks, n_total=99)
    with pytest.raises(ValueError, match="store_fp32"):
        IVFIndex().add_chunks(chunks, n_total=2048)
    with pytest.raises(ValueError, match="already"):
        idx.add_chunks(chunks, n_total=2048)
