"""Streaming fused distance → top-k over database tiles.

This is the XLA formulation of the engine core: a `lax.scan` over database
tiles keeps only a [Q, k] running winner set in memory, so the full [Q, N]
score matrix is never materialised in HBM — the equivalent of FAISS's
IndexFlat search loop (reference: seqvec_search/main.py:35-45) restructured
so each step is one large MXU matmul plus a top-k merge.

Two selection back-ends:
  * exact      — jax.lax.top_k merge per tile (bit-stable, used for golden
                 parity with FAISS neighbour lists)
  * approximate — jax.lax.approx_max_k, the TPU-native binned reduction from
                 the TPU-KNN paper (arXiv:2206.14286); recall_target-tunable,
                 much faster at large k. This plays the role of the
                 reference's approximate indexes at far higher recall.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .distance import similarity_block

NEG_INF = jnp.float32(-jnp.inf)


def _pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, rem), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "db_tile", "approx", "recall_target")
)
def streaming_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    db_tile: int = 8192,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k similarities of every query against the whole database.

    db [N, d], queries [Q, d] — both fp32 (cosine inputs pre-normalised).
    Returns (sims [Q, k] fp32 descending, ids [Q, k] int32). Padded database
    rows can never win (their similarity is -inf); if k > N the surplus slots
    hold id -1 with -inf similarity, mirroring FAISS's missing-hit sentinel.
    """
    n, d = db.shape
    q = queries.shape[0]
    db_tile = min(db_tile, max(128, 1 << (n - 1).bit_length()))
    padded = _pad_rows(db, db_tile)
    n_pad = padded.shape[0]
    num_tiles = n_pad // db_tile
    tiles = padded.reshape(num_tiles, db_tile, d)

    k_eff = min(k, n)

    q_sq = jnp.sum(jnp.square(queries), axis=-1) if metric == "l2" else None

    def select(sims_block, ids_block, kk):
        if approx and metric != "l2":
            vals, idx = jax.lax.approx_max_k(
                sims_block, kk, recall_target=recall_target
            )
        else:
            vals, idx = jax.lax.top_k(sims_block, kk)
        return vals, jnp.take_along_axis(ids_block, idx, axis=1)

    def step(carry, inputs):
        best_vals, best_ids = carry
        tile, tile_idx = inputs
        sims = similarity_block(queries, tile, metric, q_sq)
        # mask out padded database rows
        row_ids = tile_idx * db_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q, db_tile), 1
        )
        sims = jnp.where(row_ids < n, sims, NEG_INF)
        merged_vals = jnp.concatenate([best_vals, sims], axis=1)
        merged_ids = jnp.concatenate([best_ids, row_ids], axis=1)
        best_vals, best_ids = select(merged_vals, merged_ids, k_eff)
        return (best_vals, best_ids), None

    init = (
        jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32),
        jnp.full((q, k_eff), -1, dtype=jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(
        step, init, (tiles, jnp.arange(num_tiles, dtype=jnp.int32))
    )
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, ids
