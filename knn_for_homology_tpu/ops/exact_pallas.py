"""Exact large-k selection: fused distance + per-segment top-R Pallas kernel.

`lax.top_k` full-row sorts (0.96 s per [4096, 131072] fp32 block on v5e) cap
the exact FAISS-flat replacement (reference workload:
pfam/proteins_search.py:49, k=1000) at ~2.6x the CPU baseline. Selection
doesn't need a full sort; this module generalises the TPU-KNN binned
reduction (arXiv:2206.14286, which keeps ONE max per bin for approximate
search) to keep the top **R** per bin, with an exactness certificate:

  * The database axis is cut into strided segments: column c belongs to
    segment c mod W, with W == the kernel's db tile width. Lane t of every
    db tile is segment t, so the running per-segment state needs no
    cross-lane traffic at all.
  * One Pallas kernel fuses the MXU distance matmul with a per-lane
    insertion sort that maintains each segment's R largest (value, id)
    pairs in VMEM scratch across db tiles — an R-step bubble of dense
    compare/select ops on the VPU. The [Q, N] similarity matrix never
    touches HBM.
  * A small two-key sort (value desc, id asc — exactly `lax.top_k`'s tie
    order) over the [Q, R*W] candidate buffer yields the top-k.
  * Certificate: the result can only miss a true top-k element if some
    segment discarded one, and every discarded element is <= that
    segment's smallest kept value. So if every segment's R-th kept value
    is < the k-th overall value, the row is PROVABLY exact. Violating rows
    (a segment holding >= R of the row's top-k: P ~ Poisson(k/W) tail,
    ~1e-6 per segment for k=1000, W=1024; striding defeats clustered id
    runs since a run of length <= W hits each segment at most once) are
    recomputed with `lax.top_k` — exactness is unconditional, the sort is
    just evicted from the hot path.

Replaces the threshold+compaction design kept in ops/exact_topk.py, whose
compaction step has no efficient TPU lowering (scatter sorts; per-row
cursors serialise).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import pad_rows

NEG_INF = float(-jnp.inf)

# Per-segment slots. R*W is the candidate-buffer width; the certificate
# flags a row iff some segment holds >= R of its top-k (then we fall back).
DEFAULT_R = 8


def _segment_topr_kernel(
    nv_ref, q_ref, db_ref, vals_ref, ids_ref,
    *, r_slots, metric, n_db, precision,
):
    # The output blocks double as the running per-segment top-R state
    # (slot r = columns r*T:(r+1)*T): their BlockSpec revisits the same
    # block for every j, so Mosaic keeps them VMEM-resident across the db
    # axis — no separate scratch, which would blow the 16 MB scoped VMEM.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        ids_ref[:] = jnp.full_like(ids_ref, -1)

    q = q_ref[:]
    db = db_ref[:]
    dots = jax.lax.dot_general(
        q,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == "l2":
        q_sq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        d_sq = jnp.sum(jnp.square(db.astype(jnp.float32)), axis=1, keepdims=True)
        sims = 2.0 * dots - q_sq - d_sq.T
    else:
        sims = dots

    tile = db.shape[0]
    qb = q.shape[0]
    col_ids = j * tile + jax.lax.broadcasted_iota(jnp.int32, (qb, tile), 1)
    # bound = min(static row count, traced n_valid) — n_valid rides SMEM so
    # shard_map callers can mask their shard's pad rows without a recompile
    sims = jnp.where(
        col_ids < jnp.minimum(n_db, nv_ref[0]), sims, NEG_INF
    )

    # Insert this tile's one candidate per lane into the lane's sorted
    # R-slot list (desc). Strict > keeps the earlier (lower-id) element on
    # ties, matching lax.top_k order; each lane sees exactly one candidate
    # per tile, so there is no intra-tile conflict.
    cand_v, cand_i = sims, col_ids
    for r in range(r_slots):
        sl = slice(r * tile, (r + 1) * tile)
        bv = vals_ref[:, sl]
        bi = ids_ref[:, sl]
        take = cand_v > bv
        vals_ref[:, sl] = jnp.where(take, cand_v, bv)
        ids_ref[:, sl] = jnp.where(take, cand_i, bi)
        cand_v = jnp.where(take, bv, cand_v)
        cand_i = jnp.where(take, bi, cand_i)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "r_slots", "metric", "db_tile", "query_block", "interpret",
        "highest_precision",
    ),
)
def _candidates_and_topk(
    db, queries, k, r_slots, metric, db_tile, query_block, interpret,
    highest_precision, n_valid=None,
):
    """Kernel + epilogue: returns (vals [Q,k], ids [Q,k], suspect [Q] bool).
    `n_valid` may be a traced scalar (shard_map pad masking)."""
    n, d = db.shape
    q_n = queries.shape[0]

    db_p = pad_rows(db, db_tile)
    q_p = pad_rows(queries, query_block)
    grid = (q_p.shape[0] // query_block, db_p.shape[0] // db_tile)
    width = r_slots * db_tile

    nv = jnp.full((1,), n if n_valid is None else n_valid, jnp.int32)
    precision = (
        jax.lax.Precision.HIGHEST if highest_precision
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _segment_topr_kernel,
        r_slots=r_slots, metric=metric, n_db=n, precision=precision,
    )
    buf_v, buf_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (query_block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (db_tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (query_block, width), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (query_block, width), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_p.shape[0], width), jnp.float32),
            jax.ShapeDtypeStruct((q_p.shape[0], width), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_p.shape[0] * db_p.shape[0] * d,
            bytes_accessed=(
                q_p.shape[0] * d * 4
                + grid[0] * db_p.shape[0] * db.dtype.itemsize
                + q_p.shape[0] * width * 8
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, q_p, db_p)
    buf_v, buf_i = buf_v[:q_n], buf_i[:q_n]

    # Order candidates exactly like lax.top_k: value desc, id asc on ties.
    neg_v, ids_sorted = jax.lax.sort((-buf_v, buf_i), num_keys=2)
    vals = -neg_v[:, :k]
    ids = ids_sorted[:, :k]

    # Certificate: a row can only be wrong if some segment discarded an
    # element >= the row's k-th value; discards are <= the segment's R-th
    # kept value (last slot of the buffer layout). theta == -inf means the
    # row has < k real candidates — nothing can be missing.
    theta = vals[:, k - 1]
    min_kept = buf_v[:, (r_slots - 1) * db_tile :]
    suspect = jnp.any(min_kept >= theta[:, None], axis=1) & jnp.isfinite(theta)
    return vals, ids, suspect


def _plan(
    n: int, d: int, k_eff: int, db_tile: int, query_block: int,
    r_slots: int, exact: bool, recall_target: float, itemsize: int,
):
    """Shared kernel sizing for the host and traced variants (they MUST
    pick identical shapes: the 13 MB VMEM budget and the exactness
    headroom are correctness-relevant). Returns
    (db_tile, query_block, r_slots, max_block)."""
    db_tile = min(db_tile, max(128, _round_up(n, 128)))
    if not exact:
        r_slots = r_for_recall(k_eff, db_tile, recall_target)
    # r_slots * db_tile candidates must cover k with headroom, and the
    # striding argument (id runs <= W hit each segment <= ceil(k/W)+1
    # times) needs W ~ k; tiny-n tests shrink the tile, so grow R to fit.
    while r_slots * db_tile < (
        max(2 * k_eff, k_eff + db_tile) if exact else k_eff
    ):
        r_slots *= 2
    # VMEM: the two output blocks hold the running state (QB * R*T * 8 B,
    # double-buffered across query blocks) + db tile (double-buffered) +
    # q block + the sims tile. Scoped VMEM is 16 MB; leave margin.
    while (
        query_block > 8
        and (
            2 * 2 * r_slots * query_block * db_tile * 4
            + 2 * db_tile * d * itemsize
            + query_block * d * itemsize
            + query_block * db_tile * 4
        )
        > 13 * 1024 * 1024
    ):
        query_block //= 2
    # The [QB, r*T] candidate buffer is the only O(Q) HBM cost — block the
    # queries so it stays bounded regardless of Q.
    max_block = max(
        query_block, (256 << 20) // (r_slots * db_tile * 8) // 8 * 8 or 8
    )
    return db_tile, query_block, r_slots, max_block


def r_for_recall(k: int, db_tile: int, recall_target: float) -> int:
    """Smallest per-segment slot count R whose expected element loss meets
    the recall target. Top-k elements land in segments ~Poisson(λ = k/W);
    a segment drops E[(X-R)+] elements, so the missed fraction is
    E[(X-R)+]/λ. (The exact mode instead uses R=8 + a certificate.)"""
    import math

    lam = max(k / db_tile, 1e-9)
    for r in range(1, 65):
        # E[(X-r)^+] for Poisson(lam)
        loss = sum(
            (x - r) * math.exp(-lam) * lam**x / math.factorial(x)
            for x in range(r + 1, r + 40)
        )
        if loss / lam <= (1.0 - recall_target):
            return r
    return 64


def exact_pallas_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    db_tile: int = 1024,
    query_block: int = 64,
    r_slots: int = DEFAULT_R,
    interpret: bool = None,
    highest_precision: bool = None,
    exact: bool = True,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the whole database (large-k fast path).

    db [N, d], queries [Q, d]. Returns (sims [Q, k] descending, ids [Q, k]
    int32) bit-identical to `lax.top_k` over the same similarity rows
    (internal convention of ops/distance.py; l2 = 2qd - |q|^2 - |d|^2).
    k > N pads with (-inf, -1) like FAISS's missing-hit sentinel.

    `highest_precision` defaults to fp32-inputs => HIGHEST (FAISS-parity,
    per CLAUDE.md) and bf16 inputs => DEFAULT (fp32 MXU accumulation).
    """
    db = jnp.asarray(db)
    queries = jnp.asarray(queries)
    n, d = db.shape
    q_n = queries.shape[0]
    if q_n == 0:
        return jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if highest_precision is None:
        highest_precision = db.dtype == jnp.float32
    k_eff = min(k, n)

    # under a jit/shard_map trace the host-side certificate handling
    # (np.asarray on `suspect`) cannot run — transparently defer to the
    # fully-traceable variant (identical kernel shapes via the shared
    # _plan; its fallback is a lax.cond)
    if isinstance(db, jax.core.Tracer) or isinstance(
        queries, jax.core.Tracer
    ):
        return exact_pallas_topk_traced(
            db, queries, k, metric=metric, db_tile=db_tile,
            query_block=query_block, r_slots=r_slots, interpret=interpret,
            highest_precision=highest_precision, exact=exact,
            recall_target=recall_target,
        )

    db_tile, query_block, r_slots, max_block = _plan(
        n, d, k_eff, db_tile, query_block, r_slots, exact, recall_target,
        db.dtype.itemsize,
    )
    if q_n > max_block:
        outs = [
            exact_pallas_topk(
                db, queries[s : s + max_block], k, metric=metric,
                db_tile=db_tile, query_block=query_block, r_slots=r_slots,
                interpret=interpret, highest_precision=highest_precision,
                exact=exact, recall_target=recall_target,
            )
            for s in range(0, q_n, max_block)
        ]
        return (
            jnp.concatenate([v for v, _ in outs], axis=0),
            jnp.concatenate([i for _, i in outs], axis=0),
        )
    vals, ids, suspect = _candidates_and_topk(
        db, queries, k_eff, r_slots, metric, db_tile, query_block,
        interpret, highest_precision,
    )

    flagged = (
        np.flatnonzero(np.asarray(suspect)) if exact else np.empty(0, int)
    )
    if flagged.size:
        # Rare exactness fallback (a segment held >= R of a row's top-k):
        # full-row sort for just those rows.
        from .topk import oneshot_topk

        sub = queries[flagged]
        f_vals, f_ids = oneshot_topk(db, sub, k_eff, metric=metric)
        vals = jnp.asarray(vals).at[flagged].set(f_vals)
        ids = jnp.asarray(ids).at[flagged].set(f_ids)

    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "db_tile", "query_block", "r_slots", "interpret",
        "highest_precision", "exact", "recall_target",
    ),
)
def exact_pallas_topk_traced(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    n_valid=None,  # traced scalar ok (shard pad masking)
    db_tile: int = 1024,
    query_block: int = 64,
    r_slots: int = DEFAULT_R,
    interpret: bool = None,
    highest_precision: bool = None,
    exact: bool = True,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-jittable segment-top-R top-k — safe inside shard_map/jit.

    Same math as exact_pallas_topk, but the exactness fallback is a
    `lax.cond` over an O(k)-memory streaming recompute of the WHOLE query
    block (instead of host-side suspect-row selection, which round-trips
    through numpy and cannot trace). The certificate fires with
    probability ~1e-6 per row, so the recompute branch almost never runs.
    """
    from .topk import streaming_topk

    n, d = db.shape
    q_n = queries.shape[0]
    k_eff = min(k, n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if highest_precision is None:
        # parity with the host variant: fp32 inputs default to HIGHEST
        # (bf16-truncated matmuls swap near-tie neighbours, CLAUDE.md)
        highest_precision = db.dtype == jnp.float32
    db_tile, query_block, r_slots, max_block = _plan(
        n, d, k_eff, db_tile, query_block, r_slots, exact, recall_target,
        db.dtype.itemsize,
    )
    # the [QB, R*T] candidate buffer is bounded by blocking queries
    # (unrolled in the trace: Q is static)
    vals_out, ids_out = [], []
    for s in range(0, q_n, max_block):
        q_blk = queries[s : s + max_block]
        vals, ids, suspect = _candidates_and_topk(
            db, q_blk, k_eff, r_slots, metric, db_tile, query_block,
            interpret, highest_precision, n_valid,
        )
        if exact:
            vals, ids = jax.lax.cond(
                jnp.any(suspect),
                lambda q_blk=q_blk, v=vals, i=ids: streaming_topk(
                    db, q_blk, k_eff, metric=metric, n_valid=n_valid
                ),
                lambda q_blk=q_blk, v=vals, i=ids: (v, i),
            )
        vals_out.append(vals)
        ids_out.append(ids)
    vals = jnp.concatenate(vals_out, axis=0)
    ids = jnp.concatenate(ids_out, axis=0)
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, ids


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
