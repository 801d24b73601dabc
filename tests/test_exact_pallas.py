"""exact_pallas_topk must be bit-identical to lax.top_k (the FAISS-parity
contract for the large-k exact engine), including its tie order, across
metrics, awkward shapes, and the adversarial case that forces the
certificate fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knn_for_homology_tpu.ops import exact_pallas
from knn_for_homology_tpu.ops.exact_pallas import exact_pallas_topk
from knn_for_homology_tpu.ops.topk import oneshot_topk


def _check(db, queries, k, metric="ip", **kw):
    # ids must be bit-identical to lax.top_k; values agree within the
    # tiled-vs-oneshot matmul accumulation-order difference (~1e-5, the
    # same property the streaming engine has).
    vals, ids = exact_pallas_topk(db, queries, k, metric=metric, **kw)
    want_vals, want_ids = oneshot_topk(db, queries, k, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_allclose(
        np.asarray(vals, np.float32),
        np.asarray(want_vals, np.float32),
        rtol=1e-5,
        atol=1e-4,
    )


def test_matches_lax_topk_random():
    rng = np.random.RandomState(0)
    db = jnp.asarray(rng.randn(2000, 64).astype(np.float32))
    q = jnp.asarray(rng.randn(37, 64).astype(np.float32))
    _check(db, q, 300)


def test_matches_lax_topk_l2():
    rng = np.random.RandomState(1)
    db = jnp.asarray(rng.randn(1500, 32).astype(np.float32))
    q = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    _check(db, q, 200, metric="l2")


def test_ties_resolve_like_lax_topk():
    # many duplicated rows → duplicated similarity values; tie order must
    # be id-ascending like lax.top_k
    rng = np.random.RandomState(2)
    base = rng.randn(50, 16).astype(np.float32)
    db = jnp.asarray(np.tile(base, (8, 1)))  # 400 rows, 8-fold value ties
    q = jnp.asarray(rng.randn(9, 16).astype(np.float32))
    _check(db, q, 120)


def test_awkward_shapes_and_k_padding():
    rng = np.random.RandomState(3)
    db = jnp.asarray(rng.randn(333, 48).astype(np.float32))
    q = jnp.asarray(rng.randn(5, 48).astype(np.float32))
    _check(db, q, 333)  # k == n
    # k > n: FAISS sentinel padding
    vals, ids = exact_pallas_topk(db, q, 400)
    assert ids.shape == (5, 400)
    assert np.all(np.asarray(ids[:, 333:]) == -1)
    assert np.all(np.isneginf(np.asarray(vals[:, 333:])))


def test_empty_queries():
    db = jnp.zeros((10, 8), jnp.float32)
    vals, ids = exact_pallas_topk(db, jnp.zeros((0, 8), jnp.float32), 5)
    assert vals.shape == (0, 5) and ids.shape == (0, 5)


def test_adversarial_segment_forces_fallback_and_stays_exact():
    # Plant > R of the top-k inside ONE strided segment (ids ≡ 3 mod 128
    # with db_tile=128, r_slots=2) so the certificate must fire; the
    # result must still be bit-identical to lax.top_k.
    rng = np.random.RandomState(4)
    d = 16
    db_np = rng.randn(2048, d).astype(np.float32) * 0.01
    spike = rng.randn(d).astype(np.float32)
    spike /= np.linalg.norm(spike)
    for row in range(3, 2048, 128):  # 16 rows, all in segment 3
        db_np[row] = spike * (1.0 + 0.001 * row)
    q = jnp.asarray(spike[None, :])
    db = jnp.asarray(db_np)

    vals, ids, suspect = exact_pallas._candidates_and_topk(
        db, q, 8, 2, "ip", 128, 8, True, True
    )
    assert bool(np.asarray(suspect)[0]), "certificate must flag this row"

    _check(db, q, 8, db_tile=128, r_slots=2)


def test_bf16_storage_matches_bf16_oneshot():
    rng = np.random.RandomState(5)
    db = jnp.asarray(rng.randn(1024, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )
    q = jnp.asarray(rng.randn(11, 64).astype(np.float32)).astype(jnp.bfloat16)
    _check(db, q, 100)


def test_certificate_not_suspect_on_spread_data():
    rng = np.random.RandomState(6)
    db = jnp.asarray(rng.randn(4096, 32).astype(np.float32))
    q = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    _, _, suspect = exact_pallas._candidates_and_topk(
        db, q, 64, 8, "ip", 512, 8, True, True
    )
    assert not np.asarray(suspect).any()


def test_traced_variant_matches_topk_with_n_valid():
    """exact_pallas_topk_traced under jit with a TRACED n_valid must equal
    lax.top_k over the valid prefix (the shard_map contract)."""
    import jax

    from knn_for_homology_tpu.ops.exact_pallas import exact_pallas_topk_traced

    rng = np.random.RandomState(3)
    n, d, k = 640, 128, 40
    db = rng.randn(n, d).astype(np.float32)
    q = rng.randn(16, d).astype(np.float32)

    @jax.jit
    def run(db, q, n_valid):
        return exact_pallas_topk_traced(
            jnp.asarray(db), jnp.asarray(q), k, metric="ip",
            n_valid=n_valid, interpret=True, highest_precision=True,
        )

    n_valid = jnp.int32(500)
    vals, ids = run(db, q, n_valid)
    sims = q @ db[:500].T
    want_v, want_i = jax.lax.top_k(jnp.asarray(sims), k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v), rtol=1e-6)


def test_traced_variant_certificate_fallback_fires():
    """An adversarial row whose top-k all share one segment (ids ≡ 0 mod
    tile) must still come back exact — the in-jit lax.cond streaming
    fallback handles what the host-side path fixes with row recompute."""
    import jax

    from knn_for_homology_tpu.ops.exact_pallas import exact_pallas_topk_traced

    rng = np.random.RandomState(4)
    n, d, k, tile = 10240, 128, 10, 1024
    db = rng.randn(n, d).astype(np.float32) * 0.01
    probe = rng.randn(d).astype(np.float32)
    probe /= np.linalg.norm(probe)
    # 10 planted winners, ALL in segment 0 (> R=8 slots): ids 0,1024,...
    for rank, row in enumerate(range(0, n, tile)):
        db[row] = probe * (20.0 - rank)
    q = probe[None, :].repeat(8, axis=0)

    vals, ids = jax.jit(
        lambda db, q: exact_pallas_topk_traced(
            db, q, k, metric="ip", db_tile=tile, interpret=True,
            highest_precision=True,
        )
    )(jnp.asarray(db), jnp.asarray(q))
    sims = q @ db.T
    want_v, want_i = jax.lax.top_k(jnp.asarray(sims), k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(want_v), rtol=1e-6
    )


def test_flat_topk_traceable_under_jit():
    """flat_topk must stay jit-wrappable on every backend: the TPU route's
    host-side certificate handling defers to the traceable variant under a
    trace (review r2: np.asarray(suspect) raised TracerArrayConversionError
    for jit callers)."""
    import jax

    from knn_for_homology_tpu.ops.exact_pallas import exact_pallas_topk

    rng = np.random.RandomState(6)
    db = rng.randn(512, 128).astype(np.float32)
    q = rng.randn(8, 128).astype(np.float32)

    @jax.jit
    def run(db, q):
        # call the pallas engine directly (flat_topk only routes here on a
        # TPU backend; the dispatch-under-trace is what's under test)
        return exact_pallas_topk(
            jnp.asarray(db), jnp.asarray(q), 40, metric="ip",
            interpret=True, highest_precision=True,
        )

    vals, ids = run(db, q)
    want_v, want_i = jax.lax.top_k(jnp.asarray(q @ db.T), 40)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v), rtol=1e-6)


def test_sq8_storage_recall_and_decode():
    # SQ8 streams int8 rows + per-row scales: ids decode exactly, recall
    # stays in the Poisson band despite quantisation noise, and values
    # carry the dequant scale (match fp32 sims to ~1%-of-norm).
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    key = jax.random.PRNGKey(0)
    db = l2_normalize(jax.random.normal(key, (4096, 256), jnp.float32))
    q = db[:256]
    k = 100
    _, exact_ids = jax.lax.top_k(q @ db.T, k)
    vals, ids = packed_pallas_topk(
        db, q, k, metric="cosine", storage="sq8", recall_target=0.98
    )
    ids_np, exact_np = np.asarray(ids), np.asarray(exact_ids)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(ids_np, exact_np)
        ]
    )
    assert rec >= 0.97
    # self-hit must survive quantisation (largest sim by a margin)
    np.testing.assert_array_equal(ids_np[:, 0], np.arange(256))
    # returned values ≈ true similarities of the returned ids
    true_vals = np.take_along_axis(np.asarray(q @ db.T), ids_np, axis=1)
    np.testing.assert_allclose(np.asarray(vals), true_vals, atol=2e-2)


def test_sq8_storage_l2_metric():
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    rng = np.random.RandomState(3)
    db = jnp.asarray(rng.randn(2048, 128).astype(np.float32))
    q = db[:64]
    k = 50
    d2 = (
        -2.0 * (q @ db.T)
        + jnp.sum(db * db, 1)[None, :]
        + jnp.sum(q * q, 1)[:, None]
    )
    _, exact_ids = jax.lax.top_k(-d2, k)
    _, ids = packed_pallas_topk(db, q, k, metric="l2", storage="sq8")
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(np.asarray(ids), np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.95


def test_sq8_rejects_prequantized_and_unknown_storage():
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    db8 = jnp.zeros((256, 128), jnp.int8)
    q = jnp.zeros((4, 128), jnp.float32)
    with pytest.raises(ValueError, match="quantises internally"):
        packed_pallas_topk(db8, q, 5, storage="sq8")
    with pytest.raises(ValueError, match="unknown storage"):
        packed_pallas_topk(
            jnp.zeros((256, 128), jnp.float32), q, 5, storage="int4"
        )


def test_sq8_sym_storage_matches_and_scales_values():
    # symmetric int8: recall in band, epilogue applies the per-query scale
    # so returned values still approximate true similarities
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    key = jax.random.PRNGKey(1)
    db = l2_normalize(jax.random.normal(key, (4096, 256), jnp.float32))
    # un-normalised queries exercise the per-query dequant scale
    q = db[:128] * jnp.linspace(0.5, 3.0, 128)[:, None]
    k = 100
    sims_true = np.asarray(q @ db.T)
    _, exact_ids = jax.lax.top_k(q @ db.T, k)
    vals, ids = packed_pallas_topk(
        db, q, k, metric="ip", storage="sq8-sym", recall_target=0.98
    )
    ids_np = np.asarray(ids)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(ids_np, np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.97
    true_vals = np.take_along_axis(sims_true, ids_np, axis=1)
    np.testing.assert_allclose(np.asarray(vals), true_vals, atol=5e-2)


def test_sq8_sym2_residual_pass_tightens_values():
    """storage="sq8-sym2" (two-level query quantisation) must return
    values within the residual floor (~1e-4 relative) of the FLOAT-query
    × dequantised-row scores — an order tighter than one-pass sym's
    ~0.4 % query noise — at equal-or-better recall."""
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk
    from knn_for_homology_tpu.ops.graph_pallas import quantize_int8

    key = jax.random.PRNGKey(3)
    db = l2_normalize(jax.random.normal(key, (4096, 256), jnp.float32))
    q = db[:128] * jnp.linspace(0.5, 3.0, 128)[:, None]
    k = 100
    vals, ids = packed_pallas_topk(
        db, q, k, metric="ip", storage="sq8-sym2", recall_target=0.98
    )
    ids_np = np.asarray(ids)
    # storage floor reference: float query x dequantised int8 rows
    db8, dsc = quantize_int8(db)
    deq = np.asarray(db8, np.float32) * np.asarray(dsc)[:, None]
    sims_floor = np.asarray(q, np.float32) @ deq.T
    got = np.take_along_axis(sims_floor, ids_np, axis=1)
    np.testing.assert_allclose(np.asarray(vals), got, rtol=3e-4, atol=3e-4)
    _, exact_ids = jax.lax.top_k(q @ db.T, k)
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(ids_np, np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.97, rec


def test_sq8_sym_l2_falls_back_to_asymmetric():
    # l2 cannot fold the query scale into the epilogue; the sym request
    # must still return correct l2 neighbours (via the asymmetric kernel)
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    rng = np.random.RandomState(7)
    db = jnp.asarray(rng.randn(2048, 128).astype(np.float32))
    q = db[:64]
    k = 50
    d2 = (
        -2.0 * (q @ db.T)
        + jnp.sum(db * db, 1)[None, :]
        + jnp.sum(q * q, 1)[:, None]
    )
    _, exact_ids = jax.lax.top_k(-d2, k)
    _, ids = packed_pallas_topk(db, q, k, metric="l2", storage="sq8-sym")
    rec = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(np.asarray(ids), np.asarray(exact_ids))
        ]
    )
    assert rec >= 0.95


def test_sq8_prequantized_database_matches_inline():
    # SQ8Database (quantize-once) must give exactly the inline-quantised
    # result, and FlatIndex(backend="sq8") must cache it across searches
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.exact_pallas import (
        packed_pallas_topk,
        quantize_database,
    )
    from knn_for_homology_tpu.search.flat import FlatIndex

    key = jax.random.PRNGKey(2)
    db = l2_normalize(jax.random.normal(key, (2048, 128), jnp.float32))
    q = db[:64]
    k = 30
    dbq = quantize_database(db)
    v1, i1 = packed_pallas_topk(dbq, q, k, metric="ip")
    v2, i2 = packed_pallas_topk(db, q, k, metric="ip", storage="sq8-sym")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # eager vs in-jit quantisation can fuse the scale arithmetic a last-ulp
    # differently; decoded values then differ by <= 2^jbits f32 ulps
    np.testing.assert_allclose(
        np.asarray(v1), np.asarray(v2), rtol=0, atol=1e-5
    )

    ix = FlatIndex(metric="cosine", backend="sq8").add(np.asarray(db))
    s1, j1 = ix.search(np.asarray(q), k)
    assert ix._db_sq8 is not None  # quantised once, cached
    s2, j2 = ix.search(np.asarray(q), k)
    np.testing.assert_array_equal(j1, j2)
    ix.add(np.asarray(db[:8]))  # mutation invalidates the cache
    assert ix._db_sq8 is None

    # flat_topk accepts the prequantised database directly (bench sq8-pq
    # mode: quantisation is index-build work, outside the timed search)
    from knn_for_homology_tpu.ops.topk import flat_topk

    v3, i3 = flat_topk(dbq, q, k, metric="ip", approx=True)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i1))
    with pytest.raises(ValueError):
        flat_topk(dbq, q, k, metric="ip", approx=False)


def test_sq8_kernels_compiled_match_interpret_on_tpu():
    """CI runs every sq8 test in interpret mode (CPU mesh); the Mosaic
    compilation that actually runs on hardware is only exercised by the
    benches. Same rationale as the graph DMA test: compare the COMPILED
    kernels against interpret mode on identical inputs. Skipped off-TPU;
    run via KNN_TPU_TEST_PLATFORM=axon pytest ... -k compiled.

    The interpret reference runs pinned to the LOCAL CPU backend:
    interpret-mode Pallas emulates the kernel with thousands of small
    device ops, and issuing those through the axon relay (ms-latency per
    dispatch) hangs for hours."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled-kernel parity requires a real TPU")
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.exact_pallas import packed_pallas_topk

    key = jax.random.PRNGKey(5)
    db_np = np.asarray(
        l2_normalize(jax.random.normal(key, (4096, 256), jnp.float32))
    )
    q_np = db_np[:128]
    k = 64
    cpu = jax.devices("cpu")[0]
    for storage in ("sq8", "sq8-sym"):
        v_c, i_c = packed_pallas_topk(
            jnp.asarray(db_np), jnp.asarray(q_np), k,
            metric="cosine", storage=storage, interpret=False,
        )
        with jax.default_device(cpu):
            v_i, i_i = packed_pallas_topk(
                jnp.asarray(db_np), jnp.asarray(q_np), k,
                metric="cosine", storage=storage, interpret=True,
            )
        np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_i))
        np.testing.assert_allclose(
            np.asarray(v_c), np.asarray(v_i), rtol=0, atol=1e-5
        )
