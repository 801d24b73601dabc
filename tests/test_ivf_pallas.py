"""ivf_union_topk: the gather-free indirect union scan (interpret mode —
the TPU-compiled kernel is exercised by the driver bench and the TPU-gated
twin in test_exact_pallas.py's style).

The kernel must reproduce the dense int8 reference over exactly the
selected cells' real rows: same dequant math as the sq8-sym flat kernel,
capacity-padding slots never surfacing, and the returned `pos` following
the slab-ordered buffer convention the fp32 rescores consume.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from knn_for_homology_tpu.ops import graph_pallas as gp
from knn_for_homology_tpu.ops.ivf_pallas import ivf_union_topk


def _packed_fixture(seed=0, C=64, d=96, per_cell=100):
    rng = np.random.RandomState(seed)
    n = C * per_cell
    db = rng.randn(n, d).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    members = np.full((C, 128), -1, np.int32)
    perm = rng.permutation(n)
    for c in range(C):
        members[c, :per_cell] = perm[c * per_cell : (c + 1) * per_cell]
    pv, pi, sc = gp.pack_neighbours(
        jnp.asarray(db), jnp.asarray(members), 128
    )
    return db, pv, pi, sc, rng


def _reference_scores(db_pad_d, pv, pi, sc, cells, q):
    """Dense f32 image of the kernel's int8 math over the selected cells."""
    q8, qsc = gp.quantize_int8(
        jnp.pad(q, ((0, 0), (0, pv.shape[1] - q.shape[1])))
    )
    rows8 = (
        np.asarray(pv)
        .reshape(pi.shape[0], 128, -1)[np.asarray(cells)]
        .reshape(-1, pv.shape[1])
    )
    gids = np.asarray(pi)[np.asarray(cells)].reshape(-1)
    scs = np.asarray(sc)[np.asarray(cells)].reshape(-1)
    ref = (
        np.asarray(q8, np.float32) @ rows8.T.astype(np.float32)
    ) * scs[None, :] * np.asarray(qsc)[:, None]
    ref[:, gids < 0] = -np.inf
    return ref, gids


@pytest.mark.parametrize("budget", [8, 16])
def test_indirect_scan_matches_dense_reference(budget):
    db, pv, pi, sc, rng = _packed_fixture()
    cells = jnp.asarray(
        rng.choice(pi.shape[0], budget, replace=False).astype(np.int32)
    )
    q = jnp.asarray(db[:32])
    k = 10
    vals, pos, ids = ivf_union_topk(pv, sc, pi, cells, q, k, interpret=True)
    vals, pos, ids = np.asarray(vals), np.asarray(pos), np.asarray(ids)
    ref, gids = _reference_scores(db, pv, pi, sc, cells, q)
    ref_sorted = -np.sort(-ref, axis=1)[:, :k]
    ref_top = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    # id recall vs the dense reference >= the engine's Poisson target
    overlap = np.mean(
        [
            len(set(ids[i].tolist()) & set(gids[ref_top[i]].tolist())) / k
            for i in range(q.shape[0])
        ]
    )
    assert overlap >= 0.98, overlap
    # returned values match the reference where the ids agree (packed
    # truncation < ~1e-3 relative at these jbits)
    np.testing.assert_allclose(vals[:, 0], ref_sorted[:, 0], rtol=2e-3)
    # capacity-padding rows never surface
    assert (ids >= 0).all()
    # pos convention: ids == pi[cells[pos // 128], pos % 128]
    rec = np.asarray(pi)[np.asarray(cells)[pos // 128], pos % 128]
    np.testing.assert_array_equal(rec, ids)


def test_sym2_residual_pass_tightens_values():
    """compute="sym2" removes the query-side quantisation noise: kernel
    values must match the float-query × dequantised-row scores to the
    packed-truncation + residual floor (~1e-4 relative), an order tighter
    than one-pass sym's ~0.4 % query noise; ids at least as accurate."""
    db, pv, pi, sc, rng = _packed_fixture(seed=2)
    cells = jnp.asarray(
        rng.choice(pi.shape[0], 16, replace=False).astype(np.int32)
    )
    q = jnp.asarray(db[:32])
    k = 10
    vals, pos, ids = ivf_union_topk(
        pv, sc, pi, cells, q, k, compute="sym2", interpret=True
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    # float-query reference over dequantised stored rows (the storage
    # floor — what a dequantised-slab fp32 rescore would return)
    rows8 = (
        np.asarray(pv)
        .reshape(pi.shape[0], 128, -1)[np.asarray(cells)]
        .reshape(-1, pv.shape[1])
    )
    gids = np.asarray(pi)[np.asarray(cells)].reshape(-1)
    scs = np.asarray(sc)[np.asarray(cells)].reshape(-1)
    qpad = np.pad(db[:32], ((0, 0), (0, pv.shape[1] - db.shape[1])))
    ref = (qpad @ rows8.T.astype(np.float32)) * scs[None, :]
    ref[:, gids < 0] = -np.inf
    # value accuracy PER RETURNED ID (recall loss — an R-slot eviction —
    # is scored separately below): each returned value must match the
    # float-query score of that same row to the residual floor
    by_gid = {int(g): j for j, g in enumerate(gids) if g >= 0}
    got = np.array(
        [[ref[i, by_gid[int(g)]] for g in ids[i]] for i in range(len(ids))]
    )
    np.testing.assert_allclose(vals, got, rtol=3e-4, atol=3e-4)
    ref_top = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    overlap = np.mean(
        [
            len(set(ids[i].tolist()) & set(gids[ref_top[i]].tolist())) / k
            for i in range(q.shape[0])
        ]
    )
    assert overlap >= 0.99, overlap


def test_indirect_scan_k_exceeds_candidates():
    db, pv, pi, sc, rng = _packed_fixture(C=8, per_cell=20)
    cells = jnp.asarray(np.arange(2, dtype=np.int32))
    q = jnp.asarray(db[:4])
    k = 100  # > 2 cells * 20 real rows
    vals, pos, ids = ivf_union_topk(pv, sc, pi, cells, q, k, interpret=True)
    vals, ids = np.asarray(vals), np.asarray(ids)
    real = ids >= 0
    assert real.sum(axis=1).max() <= 40
    assert np.isneginf(vals[~real]).all()


def test_indirect_scan_small_budget_pow2():
    """budget < SLABS_PER_STEP: e shrinks to the budget (still divides)."""
    db, pv, pi, sc, rng = _packed_fixture(C=16, per_cell=50)
    for budget in (1, 2, 4):
        cells = jnp.asarray(np.arange(budget, dtype=np.int32))
        q = jnp.asarray(db[:8])
        vals, pos, ids = ivf_union_topk(
            pv, sc, pi, cells, q, 5, interpret=True
        )
        ref, gids = _reference_scores(db, pv, pi, sc, cells, q)
        ref_top1 = gids[np.argmax(ref, axis=1)]
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], ref_top1)
