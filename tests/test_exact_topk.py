"""threshold_topk must reproduce lax.top_k exactly (the fast exact path)."""

import numpy as np

import jax
import jax.numpy as jnp

from knn_for_homology_tpu.ops.exact_topk import threshold_topk


def test_matches_lax_topk_random():
    rng = np.random.RandomState(50)
    sims = jnp.asarray(rng.randn(37, 4096).astype(np.float32))
    want_vals, want_ids = jax.lax.top_k(sims, 100)
    got_vals, got_ids = threshold_topk(sims, 100)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_array_equal(np.asarray(got_vals), np.asarray(want_vals))


def test_matches_with_negatives_and_zeros():
    rng = np.random.RandomState(51)
    sims = rng.randn(9, 512).astype(np.float32)
    sims[0, :] = -np.abs(sims[0, :])  # all negative
    sims[1, :100] = 0.0  # zeros crossing the threshold
    sims[2, :] = np.float32(-1e30)
    sims = jnp.asarray(sims)
    want_vals, want_ids = jax.lax.top_k(sims, 50)
    got_vals, got_ids = threshold_topk(sims, 50)
    np.testing.assert_array_equal(np.asarray(got_vals), np.asarray(want_vals))
    # ids may differ among exact ties (zeros); values already matched, and
    # non-tied ids must agree
    tie_mask = np.asarray(want_vals[:, 1:] == want_vals[:, :-1])
    strict = ~np.pad(tie_mask, ((0, 0), (1, 0))) & ~np.pad(
        tie_mask, ((0, 0), (0, 1))
    )
    np.testing.assert_array_equal(
        np.asarray(got_ids)[strict], np.asarray(want_ids)[strict]
    )


def test_k_equals_n():
    rng = np.random.RandomState(52)
    sims = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    want_vals, want_ids = jax.lax.top_k(sims, 64)
    got_vals, got_ids = threshold_topk(sims, 64)
    np.testing.assert_array_equal(np.asarray(got_vals), np.asarray(want_vals))
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))


def test_massive_ties_within_slack():
    sims = np.zeros((3, 256), dtype=np.float32)
    sims[:, :10] = 5.0  # 10 clear winners
    sims = jnp.asarray(sims)  # 246 ties at 0 fighting for the rest
    got_vals, got_ids = threshold_topk(sims, 20, slack=512)
    assert np.all(np.asarray(got_vals)[:, :10] == 5.0)
    assert np.all(np.asarray(got_vals)[:, 10:] == 0.0)
    # no duplicate ids
    for row in np.asarray(got_ids):
        assert len(set(row.tolist())) == 20
