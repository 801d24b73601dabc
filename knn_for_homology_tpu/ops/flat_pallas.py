"""Fused distance + top-k selection as a Pallas TPU kernel.

One kernel replaces FAISS IndexFlat's distance loop + heap selection
(reference: seqvec_search/main.py:35-45): the [QB, T] similarity block is
produced on the MXU and consumed by an in-VMEM k-selection in the same
kernel invocation, so the score matrix never touches HBM. The running
winner set for a query block lives in VMEM scratch across all database
tiles (the TPU grid iterates the database axis sequentially).

Selection is exact: k rounds of (max, first-argmax, knockout) per tile, then
an O(k) merge of the tile winners into the running winner set. That costs
O(k·QB·T) VPU work — ideal for the small-k regimes the reference runs
(hits=13, CATH k=11). Large k (=1000, reference: pfam/search.py:37) routes
to the XLA streaming engine in ops/topk.py instead.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import pad_rows

NEG_INF = float(-jnp.inf)
MAX_PALLAS_K = 32


def _extract_topk(sims, col_ids, k):
    """Exact descending top-k of sims [QB, T] via k knockout rounds.

    Ties resolve to the lowest column id, matching FAISS ordering.
    Returns (vals [QB, k], ids [QB, k])."""
    big = jnp.int32(2**30)
    vals, ids = [], []
    for _ in range(k):
        m = jnp.max(sims, axis=1, keepdims=True)
        is_m = sims == m
        idx = jnp.min(jnp.where(is_m, col_ids, big), axis=1, keepdims=True)
        vals.append(m)
        ids.append(idx)
        sims = jnp.where(col_ids == idx, NEG_INF, sims)
    return (
        jnp.concatenate(vals, axis=1),
        jnp.concatenate(ids, axis=1),
    )


def _flat_topk_kernel(
    q_ref, db_ref, vals_ref, ids_ref, best_vals, best_ids, *, k, metric, n_db
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_vals[:] = jnp.full_like(best_vals, NEG_INF)
        best_ids[:] = jnp.full_like(best_ids, -1)

    q = q_ref[:]
    db = db_ref[:]
    dots = jax.lax.dot_general(
        q,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        q_sq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        d_sq = jnp.sum(jnp.square(db.astype(jnp.float32)), axis=1, keepdims=True)
        sims = 2.0 * dots - q_sq - d_sq.T
    else:
        sims = dots

    tile = db.shape[0]
    qb = q.shape[0]
    col_local = jax.lax.broadcasted_iota(jnp.int32, (qb, tile), 1)
    col_ids = j * tile + col_local
    sims = jnp.where(col_ids < n_db, sims, NEG_INF)

    tile_vals, tile_ids = _extract_topk(sims, col_ids, k)

    # merge the tile winners into the running winner set (both [QB, k])
    cand_vals = jnp.concatenate([best_vals[:], tile_vals], axis=1)
    cand_ids = jnp.concatenate([best_ids[:], tile_ids], axis=1)
    merged_vals, merged_ids = _extract_topk(cand_vals, cand_ids, k)
    best_vals[:] = merged_vals
    best_ids[:] = merged_ids

    @pl.when(j == n_j - 1)
    def _emit():
        vals_ref[:] = best_vals[:]
        ids_ref[:] = best_ids[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "db_tile", "query_block", "interpret"),
)
def pallas_flat_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    db_tile: int = 1024,
    query_block: int = 256,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the whole database with the fused Pallas kernel.

    db [N, d], queries [Q, d]. Returns (sims [Q, k] descending, ids [Q, k]).
    Internal similarity convention as in ops/distance.py (l2 = negated
    squared distance). Requires k ≤ MAX_PALLAS_K.
    """
    if k > MAX_PALLAS_K:
        raise ValueError(f"pallas_flat_topk handles k ≤ {MAX_PALLAS_K}, got {k}")
    if interpret is None:
        # off-TPU the kernel runs in the Pallas interpreter (tests/debugging)
        interpret = jax.default_backend() != "tpu"
    n, d = db.shape
    q_n = queries.shape[0]
    if q_n == 0:
        return (
            jnp.zeros((0, k), jnp.float32),
            jnp.zeros((0, k), jnp.int32),
        )
    k_eff = min(k, n)

    db_tile = min(db_tile, _round_up(n, 128))
    query_block = min(query_block, _round_up(q_n, 8))
    # VMEM budget: double-buffered db tile + q block + the sims block must
    # fit (~16 MB/core; tile=2048 at d=1024 crashes the Mosaic compiler)
    while (
        db_tile > 256
        and (2 * db_tile * d + query_block * d + query_block * db_tile) * 4
        > 12 * 1024 * 1024
    ):
        db_tile //= 2

    db_p = pad_rows(db, db_tile)
    q_p = pad_rows(queries, query_block)
    grid = (q_p.shape[0] // query_block, db_p.shape[0] // db_tile)

    kernel = functools.partial(
        _flat_topk_kernel, k=k_eff, metric=metric, n_db=n
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (query_block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (db_tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (query_block, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (query_block, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_p.shape[0], k_eff), jnp.float32),
            jax.ShapeDtypeStruct((q_p.shape[0], k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_block, k_eff), jnp.float32),
            pltpu.VMEM((query_block, k_eff), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_p.shape[0] * db_p.shape[0] * d,
            bytes_accessed=(
                q_p.shape[0] * d * 4
                + grid[0] * db_p.shape[0] * d * 4
                + q_p.shape[0] * k_eff * 8
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_p, db_p)
    vals, ids = vals[:q_n], ids[:q_n]
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, ids


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


