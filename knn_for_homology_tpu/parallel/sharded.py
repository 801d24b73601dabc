"""Sharded exact search over a device mesh.

Two SPMD layouts (SURVEY.md §2 "sharded search / index parallelism"):

  * db-sharded    — database rows split across chips (each shard HBM-resident),
                    queries replicated. Each chip runs the local fused top-k,
                    then the k-winner sets are all-gathered over ICI and
                    merged with one small top-k. Communication is O(k·Q) —
                    independent of database size.
  * query-sharded — queries split across chips, database replicated. No merge
                    needed; right when the database is small and Q is large.

Both produce *global* database row ids identical to the single-device path,
which is the acceptance criterion (SURVEY.md §4: sharded goldens must match
bit-identically).
"""

import functools
import logging
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.distance import pad_rows
from ..ops.topk import ONESHOT_SIM_BYTES, oneshot_topk, streaming_topk
from .mesh import DATA_AXIS

logger = logging.getLogger(__name__)

# Routing of the shard-local selection through the segment-top-R Pallas
# engine (ops/exact_pallas.py exact_pallas_topk_traced — traced n_valid,
# in-jit certificate fallback; single-chip exact large-k: 2.6x -> 22x+).
# Modes via the KNN_TPU_SHARDED_PALLAS env var:
#   auto (default) — DEFAULT-ON on TPU, gated by a one-shot detached
#                    compile probe whose verdict is cached per environment
#                    (parallel/pallas_probe.py; VERDICT r2 next-round #2).
#   always         — route unconditionally (any backend; CPU tests use
#                    this to exercise the traced kernel in interpret mode).
#   never          — keep the XLA one-shot/streaming engines.
# The decision is read at TRACE time and baked into each jit
# specialisation — set the env var before the first search of a given
# shape (changing it later does not retrace already-compiled shapes).
_ROUTE_DECISION = None  # per-process memo: (decision: bool, reason: str)


def _pallas_route_enabled() -> bool:
    global _ROUTE_DECISION
    mode = os.environ.get("KNN_TPU_SHARDED_PALLAS", "auto").lower()
    if mode == "always":
        return True
    if mode == "never":
        return False
    if jax.default_backend() != "tpu":
        return False
    if _ROUTE_DECISION is None:
        from .pallas_probe import pallas_sharded_verdict

        verdict = pallas_sharded_verdict()
        if verdict is None:
            _ROUTE_DECISION = (False, "probe pending — XLA fallback")
        else:
            _ROUTE_DECISION = (
                bool(verdict),
                "probe ok" if verdict else "probe failed — XLA fallback",
            )
        logger.info(
            "sharded Pallas top-k routing: %s (%s)",
            "ON" if _ROUTE_DECISION[0] else "OFF",
            _ROUTE_DECISION[1],
        )
    return _ROUTE_DECISION[0]


def _local_topk(
    db_shard, q, k, metric, db_tile, approx, n_valid=None, storage="native"
):
    """Trace-time strategy pick for the shard-local search (see ops/topk.py:
    one-shot is much faster whenever the [Q, shard] block fits). `n_valid`
    masks this shard's pad rows BEFORE selection — a pad row's 0-vector can
    outscore real rows (negative cosines; l2 distance to the origin).

    `storage="sq8"/"sq8-sym"` (approx only) scans the shard as int8 + per-
    row dequant scales — per-ROW quantisation is shard-local, so every
    row's sq8 score matches the unsharded scan exactly (tail selection may
    differ via the per-shard packed truncation bits, as in any approx
    regime); per-chip HBM for the database halves (2× corpus per pod)."""
    if storage != "native":
        if not approx:
            raise ValueError("sq8 storage is approx-only (no certificate)")
        from ..ops.exact_pallas import packed_pallas_topk

        return packed_pallas_topk(
            db_shard, q, k, metric=metric, n_valid=n_valid, storage=storage,
            interpret=jax.default_backend() != "tpu",
        )
    if (
        k > 32
        and db_shard.shape[1] % 128 == 0
        and _pallas_route_enabled()
    ):
        from ..ops.exact_pallas import exact_pallas_topk_traced

        return exact_pallas_topk_traced(
            db_shard, q, k, metric=metric, n_valid=n_valid,
            exact=not approx,
            highest_precision=db_shard.dtype == jnp.float32,
        )
    if q.shape[0] * db_shard.shape[0] * 4 <= ONESHOT_SIM_BYTES:
        return oneshot_topk(
            db_shard, q, k, metric=metric, approx=approx, n_valid=n_valid
        )
    return streaming_topk(
        db_shard, q, k, metric=metric, db_tile=db_tile, approx=approx,
        n_valid=n_valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "mesh", "db_tile", "approx", "n_valid", "storage",
    ),
)
def db_sharded_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    mesh: Mesh,
    metric: str = "cosine",
    db_tile: int = 8192,
    approx: bool = False,
    n_valid: int = None,
    storage: str = "native",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k with the database sharded over the mesh's data axis.

    db [N, d] (padded internally to a multiple of the axis size; padded rows
    lose with -inf), queries [Q, d] replicated. Returns global
    (sims [Q, k] desc, ids [Q, k]) equal to the single-device result.
    Pass `n_valid` when db arrives pre-padded (rows ≥ n_valid never win).
    """
    n = n_valid if n_valid is not None else db.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    db_p = pad_rows(db, n_shards)
    shard_rows = db_p.shape[0] // n_shards

    def local(db_shard, q):
        shard_idx = jax.lax.axis_index(DATA_AXIS)
        row0 = shard_idx * shard_rows
        # pad rows of this shard must lose inside the local selection
        n_local = jnp.clip(n - row0, 0, shard_rows)
        sims, ids = _local_topk(
            db_shard, q, min(k, shard_rows), metric,
            min(db_tile, shard_rows), approx, n_valid=n_local,
            storage=storage,
        )
        gids = jnp.where(ids >= 0, ids + row0, -1)
        valid = (gids >= 0) & (gids < n)
        sims = jnp.where(valid, sims, -jnp.inf)
        gids = jnp.where(valid, gids, -1)
        # gather every shard's winner set and merge
        all_sims = jax.lax.all_gather(sims, DATA_AXIS, axis=0, tiled=False)
        all_ids = jax.lax.all_gather(gids, DATA_AXIS, axis=0, tiled=False)
        cand_sims = jnp.swapaxes(all_sims, 0, 1).reshape(q.shape[0], -1)
        cand_ids = jnp.swapaxes(all_ids, 0, 1).reshape(q.shape[0], -1)
        k_merge = min(k, cand_sims.shape[1])  # guard k > candidate pool
        vals, sel = jax.lax.top_k(cand_sims, k_merge)
        return vals, jnp.take_along_axis(cand_ids, sel, axis=1)

    sims, ids = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(db_p, queries)
    if sims.shape[1] < k:  # k exceeded the database: FAISS-style padding
        pad = k - sims.shape[1]
        sims = jnp.pad(sims, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return sims, ids


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "mesh", "db_tile", "approx", "storage"),
)
def query_sharded_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    mesh: Mesh,
    metric: str = "cosine",
    db_tile: int = 8192,
    approx: bool = False,
    storage: str = "native",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k with queries sharded, database replicated. Q is padded to the
    axis size; padded query rows are dropped before returning."""
    q_n = queries.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    q_p = pad_rows(queries, n_shards)

    def local(db_rep, q_shard):
        return _local_topk(
            db_rep, q_shard, k, metric, db_tile, approx, storage=storage
        )

    sims, ids = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )(db, q_p)
    return sims[:q_n], ids[:q_n]


def sharded_search(
    db,
    queries,
    k: int,
    mesh: Mesh,
    metric: str = "cosine",
    layout: str = "auto",
    **kw,
):
    """Pick a layout: shard whichever side is large. Returns (sims, ids)."""
    if layout == "auto":
        layout = "db" if db.shape[0] >= queries.shape[0] else "query"
    fn = db_sharded_topk if layout == "db" else query_sharded_topk
    return fn(jnp.asarray(db), jnp.asarray(queries), k, mesh, metric=metric, **kw)
