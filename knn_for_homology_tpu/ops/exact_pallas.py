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

# numpy scalars (not jnp): Pallas kernel bodies may not close over device
# arrays, only literals
INT32_MIN = np.int32(-(2**31))


class SQ8Database:
    """Pre-quantised database for the sq8 storage modes: int8 rows +
    per-row f32 dequant scales (quantize_database). Passing one of these
    as `db` lets repeated searches skip the per-call quantisation passes
    (several full-database sweeps of HBM traffic). Registered as a pytree
    with the row count STATIC so kernel planning stays shape-static under
    jit."""

    def __init__(self, db_i8, scales, n: int):
        self.db_i8 = db_i8
        self.scales = scales
        self.n = n


jax.tree_util.register_pytree_node(
    SQ8Database,
    lambda x: ((x.db_i8, x.scales), x.n),
    lambda n, children: SQ8Database(children[0], children[1], n),
)


def quantize_database(db) -> SQ8Database:
    """Symmetric per-row int8 quantisation of a float database — do this
    once and pass the result to packed_pallas_topk / FlatIndex for
    repeated sq8 searches."""
    from .graph_pallas import quantize_int8

    db = jnp.asarray(db)
    q8, scales = quantize_int8(db.astype(jnp.float32))
    return SQ8Database(q8, scales, db.shape[0])


def _ordered_int(u: jnp.ndarray) -> jnp.ndarray:
    """Monotone float32-bits -> int32 map (involution): the int32 ordering
    of the result equals the float ordering of the input bits. Positive
    floats map to themselves; negatives get their magnitude bits flipped so
    more-negative sorts lower."""
    return u ^ (
        jax.lax.shift_right_arithmetic(u, 31) & np.int32(0x7FFFFFFF)
    )


def _tile_sims(q, db, j, nv_ref, *, metric, n_db, precision):
    """Shared hot-path head of both segment kernels: MXU distance tile +
    pad/validity masking. Returns (sims [qb, tile] f32, valid mask)."""
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
    col_ids = j * tile + jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], tile), 1
    )
    # bound = min(static row count, traced n_valid) — n_valid rides SMEM so
    # shard_map callers can mask their shard's pad rows without a recompile
    valid = col_ids < jnp.minimum(n_db, nv_ref[0])
    return sims, valid


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
        vals_ref[:] = jnp.full_like(vals_ref, INT32_MIN)
        ids_ref[:] = jnp.full_like(ids_ref, -1)

    q = q_ref[:]
    db = db_ref[:]
    sims, valid = _tile_sims(
        q, db, j, nv_ref, metric=metric, n_db=n_db, precision=precision
    )
    tile = db.shape[0]
    qb = q.shape[0]

    # Insert this tile's one candidate per lane into the lane's sorted
    # R-slot list (desc). The stored VALUE is the similarity's monotone
    # ordered-int32 image (_ordered_int — a bijection, so compares are
    # bit-equivalent to f32 compares and the epilogue decodes the exact
    # f32 back; masked lanes take INT32_MIN, below every real value's
    # image). Strict > keeps the earlier (lower-pass) element on ties,
    # matching lax.top_k order; each lane sees exactly one candidate per
    # tile, so there is no intra-tile conflict. The stored id is the PASS
    # index j (int8 / int16 when the pass count allows): the lane is
    # implicit in the buffer column, so the global id j*tile+lane is
    # reconstructed in the epilogue. 5-6 state bytes per slot instead of
    # 8 buys a larger query block — fewer database re-streams from HBM,
    # the engine's throughput wall (exact mode ran at 116k q/s vs the
    # approx kernel's 395k purely on state-capped query blocks).
    oi = _ordered_int(jax.lax.bitcast_convert_type(sims, jnp.int32))
    cand_v = jnp.where(valid, oi, INT32_MIN)
    cand_i = jnp.zeros((qb, tile), ids_ref.dtype) + j.astype(ids_ref.dtype)
    for r in range(r_slots):
        sl = slice(r * tile, (r + 1) * tile)
        bv = vals_ref[:, sl]
        bi = ids_ref[:, sl]
        take = cand_v > bv
        vals_ref[:, sl] = jnp.where(take, cand_v, bv)
        ids_ref[:, sl] = jnp.where(take, cand_i, bi)
        cand_v = jnp.where(take, bv, cand_v)
        cand_i = jnp.where(take, bi, cand_i)


def _pack_and_insert(buf_ref, sims, valid, j, r_slots, tile, jbits):
    """Packed-slot encode + per-lane insertion (shared by the bf16 and sq8
    packed kernels). Slot encoding: high (32-jbits) bits = the similarity's
    monotone ordered-int representation truncated toward -inf; low jbits =
    the REVERSED pass index (jmax - j), so an int32 compare orders by value
    first and by smaller-database-id on truncated-value ties — one compare
    + two selects per slot-step instead of the exact kernel's five ops, and
    4 state bytes per slot instead of 8. Values decode to within 2^jbits
    float32 ulps (n_tiles=128 -> ~1e-5 relative); the approx regime has no
    exactness certificate anyway, and ids are decoded exactly."""
    jmax = np.int32((1 << jbits) - 1)
    oi = _ordered_int(jax.lax.bitcast_convert_type(sims, jnp.int32))
    cand = (oi & ~jmax) | (jmax - j)
    cand = jnp.where(valid, cand, INT32_MIN)
    for r in range(r_slots):
        sl = slice(r * tile, (r + 1) * tile)
        bv = buf_ref[:, sl]
        take = cand > bv
        buf_ref[:, sl] = jnp.where(take, cand, bv)
        cand = jnp.where(take, bv, cand)


def _segment_packed_kernel(
    nv_ref, q_ref, db_ref, buf_ref, *, r_slots, metric, n_db, precision, jbits
):
    """Approx-mode variant: ONE packed int32 per candidate slot."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        buf_ref[:] = jnp.full_like(buf_ref, INT32_MIN)

    q = q_ref[:]
    db = db_ref[:]
    sims, valid = _tile_sims(
        q, db, j, nv_ref, metric=metric, n_db=n_db, precision=precision
    )
    _pack_and_insert(
        buf_ref, sims, valid, j, r_slots, db.shape[0], jbits
    )


def _segment_packed_sq8_kernel(
    nv_ref, q_ref, db_ref, sc_ref, buf_ref, *, r_slots, metric, n_db, jbits
):
    """SQ8 storage variant: the database streams as int8 rows + one f32
    dequant scale per row (FAISS IndexScalarQuantizer SQ8's storage), so
    HBM traffic per pass HALVES vs bf16 — the engine's bandwidth wall.
    The tile is cast int8→bf16 on the VPU (exact: |q|≤127) and scored on
    the MXU; the scale multiplies the f32 similarity column (dot(q, s·v) =
    s·dot(q, v)). Dot noise grows only ~1.4× vs bf16 storage (per-row-max
    quantisation error vs bf16's per-element rounding), spent from the
    same Poisson slot budget as the bf16 kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        buf_ref[:] = jnp.full_like(buf_ref, INT32_MIN)

    q = q_ref[:]
    dbf = db_ref[:].astype(jnp.bfloat16)
    sc = sc_ref[:]  # [1, tile] f32 per-row dequant scales
    dots = jax.lax.dot_general(
        q,
        dbf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sims = dots * sc
    if metric == "l2":
        q_sq = jnp.sum(
            jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True
        )
        d_sq = (
            jnp.sum(
                jnp.square(dbf.astype(jnp.float32)), axis=1, keepdims=True
            ).T
            * sc
            * sc
        )
        sims = 2.0 * sims - q_sq - d_sq
    tile = dbf.shape[0]
    col_ids = j * tile + jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], tile), 1
    )
    valid = col_ids < jnp.minimum(n_db, nv_ref[0])
    _pack_and_insert(buf_ref, sims, valid, j, r_slots, tile, jbits)


def _segment_packed_sq8sym_kernel(
    nv_ref, q_ref, *refs, r_slots, n_db, jbits, two_level
):
    """Symmetric int8 variant (ip/cosine only): queries are ALSO int8, so
    the MXU runs its native int8×int8→int32 path at 2× the bf16 MAC rate
    — the compute wall once SQ8 removed the bandwidth one. The per-QUERY
    dequant scale is a positive per-row factor, so it cannot change any
    row's candidate ranking and is applied to the decoded top-k values in
    the epilogue, not here; only the per-db-row scale (per column — rank-
    relevant) multiplies in-kernel. l2 needs the query scale inside the
    2qd−|q|²−|d|² combination, so it stays on the asymmetric kernel.

    `two_level` ("sq8-sym2") adds a second int8 pass over the RESIDUAL
    query q_lo = round((q/qsc − q_hi)·128): sims ∝ d_hi + d_lo/128, both
    dots exact in int32, shrinking the query-side quantisation step
    127×256-fold (16-bit-quality scores) at 2× the MAC cost and the SAME
    db stream — the recall ≥0.99 operating mode (the storage noise floor
    is then the only approximation beyond the slot loss)."""
    if two_level:
        qlo_ref, db_ref, sc_ref, buf_ref = refs
    else:
        db_ref, sc_ref, buf_ref = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        buf_ref[:] = jnp.full_like(buf_ref, INT32_MIN)

    def int8_dot(qr):
        return jax.lax.dot_general(
            qr,
            db_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    sims = int8_dot(q_ref[:]).astype(jnp.float32)
    if two_level:
        sims = sims + int8_dot(qlo_ref[:]).astype(jnp.float32) * (1.0 / 128.0)
    sc = sc_ref[:]  # [1, tile] f32 per-db-row dequant scales
    sims = sims * sc
    tile = db_ref.shape[0]
    col_ids = j * tile + jax.lax.broadcasted_iota(
        jnp.int32, (sims.shape[0], tile), 1
    )
    valid = col_ids < jnp.minimum(n_db, nv_ref[0])
    _pack_and_insert(buf_ref, sims, valid, j, r_slots, tile, jbits)


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
    n_tiles = db_p.shape[0] // db_tile
    grid = (q_p.shape[0] // query_block, n_tiles)
    width = r_slots * db_tile
    # stored ids are PASS indices: the narrowest int that fits the pass
    # count (5-6 state bytes/slot instead of 8 — the VMEM saved goes to
    # query_block)
    idt = (
        jnp.int8 if n_tiles <= 127
        else jnp.int16 if n_tiles <= 32767
        else jnp.int32
    )

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
            jax.ShapeDtypeStruct((q_p.shape[0], width), jnp.int32),
            jax.ShapeDtypeStruct((q_p.shape[0], width), idt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_p.shape[0] * db_p.shape[0] * d,
            bytes_accessed=(
                q_p.shape[0] * d * 4
                + grid[0] * db_p.shape[0] * db.dtype.itemsize
                + q_p.shape[0] * width * (4 + jnp.dtype(idt).itemsize)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, q_p, db_p)
    buf_v, buf_i = buf_v[:q_n], buf_i[:q_n]

    # Reconstruct global ids: the buffer column fixes the lane (db column
    # within a tile); the stored pass index fixes the tile.
    lanes = (
        jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) % db_tile
    )
    gids = jnp.where(
        buf_i >= 0, buf_i.astype(jnp.int32) * db_tile + lanes, -1
    )
    # Order candidates exactly like lax.top_k: value desc, id asc on ties
    # (ordered-int compares == f32 compares; ~x reverses without the
    # overflow -INT32_MIN would hit, and sends empty INT32_MIN slots last).
    not_v, ids_sorted = jax.lax.sort((jnp.bitwise_not(buf_v), gids), num_keys=2)
    kept_oi = jnp.bitwise_not(not_v[:, :k])
    ids = ids_sorted[:, :k]
    vals = jnp.where(
        ids >= 0,
        jax.lax.bitcast_convert_type(_ordered_int(kept_oi), jnp.float32),
        NEG_INF,
    )

    # Certificate: a row can only be wrong if some segment discarded an
    # element >= the row's k-th value; discards are <= the segment's R-th
    # kept value (last slot of the buffer layout). theta == -inf means the
    # row has < k real candidates — nothing can be missing. Ordered-int
    # compares stand in exactly for the f32 ones.
    theta = vals[:, k - 1]
    min_kept = buf_v[:, (r_slots - 1) * db_tile :]
    suspect = (
        jnp.any(min_kept >= kept_oi[:, k - 1][:, None], axis=1)
        & jnp.isfinite(theta)
    )
    return vals, ids, suspect


# Planner VMEM budget (bytes). Scoped VMEM is ~16 MB; the margin covers
# Mosaic temporaries the byte model below doesn't count.
VMEM_BUDGET = 13 * 1024 * 1024


def default_plan_inputs(n: int, k_eff: int, exact: bool):
    """(db_tile0, query_block0) the public entry points start _plan from —
    the ONE place these defaults live, shared with plan_fingerprint so the
    bench-JSON config artifact cannot drift from the kernel actually run
    (ADVICE r4). Rationale: narrow segments shrink the per-query state
    (vals+ids for exact, packed int32 for approx), buying a bigger query
    block on this db-restream-bound engine; large n widens the approx tile
    again so the packed pass-index field keeps >= ~20 bits of value
    precision; small exact k keeps the wide tile (R won't shrink below ~2
    anyway)."""
    if exact:
        return (256 if k_eff >= 128 else 1024), 320
    return max(256, _round_up(n // 4096, 128) if n > 2**20 else 256), 512


def _state_bytes_per_slot(n: int, db_tile: int, exact: bool) -> int:
    """Exact: ordered-int32 value + narrowest pass-index id that fits.
    Approx: one packed int32."""
    if not exact:
        return 4
    n_tiles = _round_up(n, db_tile) // db_tile
    return 4 + (1 if n_tiles <= 127 else 2 if n_tiles <= 32767 else 4)


def _plan(
    n: int, d: int, k_eff: int, db_tile: int, query_block: int,
    r_slots: int, exact: bool, recall_target: float, itemsize: int,
    exact_row_target: float = 3e-3,
):
    """Shared kernel sizing for the host and traced variants (they MUST
    pick identical shapes: the VMEM budget and the exactness
    headroom are correctness-relevant). Returns
    (db_tile, query_block, r_slots, max_block). `r_slots=None` resolves
    from the Poisson suspect-rate bound (r_for_exact)."""
    db_tile = min(db_tile, max(128, _round_up(n, 128)))
    if not exact:
        r_slots = r_for_recall(k_eff, db_tile, recall_target)
    elif r_slots is None:
        r_slots = r_for_exact(k_eff, db_tile, exact_row_target)
    # r_slots * db_tile candidates must cover k with headroom, and the
    # striding argument (id runs <= W hit each segment <= ceil(k/W)+1
    # times) needs W ~ k; tiny-n tests shrink the tile, so grow R to fit.
    while r_slots * db_tile < (
        max(2 * k_eff, k_eff + db_tile) if exact else k_eff
    ):
        r_slots *= 2
    # VMEM: the output block(s) hold the running state (QB * R*T * state
    # bytes, double-buffered across query blocks) + db tile
    # (double-buffered) + q block + the sims tile (plus packing temps in
    # approx mode). The state is the dominant term: every byte shaved off
    # a slot goes directly into a bigger query block = fewer database
    # re-streams from HBM (the engine's bandwidth wall). The cap lands on
    # the largest multiple of 8 (the f32 sublane) that fits — the old
    # halve-until-fits rule threw away up to half the budget right at the
    # boundary (320→160 when 304 fit).
    sb = _state_bytes_per_slot(n, db_tile, exact)
    tmp = 1 if exact else 3  # approx: sims f32 + ordered-int + cand temps
    fixed = 2 * db_tile * d * itemsize
    per_row = (
        2 * r_slots * db_tile * sb + d * itemsize + tmp * db_tile * 4
    )
    cap = max((VMEM_BUDGET - fixed) // per_row, 8)
    if cap < query_block:
        query_block = max(cap // 8 * 8, 8)
    # The [QB, r*T] candidate buffer is the only O(Q) HBM cost — block the
    # queries so it stays bounded regardless of Q.
    max_block = max(
        query_block, (256 << 20) // (r_slots * db_tile * 8) // 8 * 8 or 8
    )
    return db_tile, query_block, r_slots, max_block


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "r_slots", "metric", "db_tile", "query_block", "interpret",
        "highest_precision",
    ),
)
def _packed_candidates_topk(
    db, queries, k, r_slots, metric, db_tile, query_block, interpret,
    highest_precision, n_valid=None,
):
    """Packed approx kernel + epilogue: returns (vals [Q,k], ids [Q,k]).
    Fully traceable (no host round trips — the approx regime has no
    exactness fallback)."""
    n, d = db.shape
    q_n = queries.shape[0]

    db_p = pad_rows(db, db_tile)
    q_p = pad_rows(queries, query_block)
    n_tiles = db_p.shape[0] // db_tile
    jbits = max(1, (n_tiles - 1).bit_length())
    grid = (q_p.shape[0] // query_block, n_tiles)
    width = r_slots * db_tile

    nv = jnp.full((1,), n if n_valid is None else n_valid, jnp.int32)
    precision = (
        jax.lax.Precision.HIGHEST if highest_precision
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _segment_packed_kernel,
        r_slots=r_slots, metric=metric, n_db=n, precision=precision,
        jbits=jbits,
    )
    buf = pl.pallas_call(
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
        out_specs=pl.BlockSpec(
            (query_block, width), lambda i, j: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q_p.shape[0], width), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_p.shape[0] * db_p.shape[0] * d,
            bytes_accessed=(
                q_p.shape[0] * d * 4
                + grid[0] * db_p.shape[0] * db.dtype.itemsize
                + q_p.shape[0] * width * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, q_p, db_p)
    return _decode_packed(buf[:q_n], k, db_tile, jbits)


def _decode_packed(buf, k, db_tile, jbits):
    # Single-key int32 top-k replaces the exact path's two-key sort: the
    # packed encoding already orders (value desc, earlier pass first).
    packed, pos = jax.lax.top_k(buf, k)
    jmax = np.int32((1 << jbits) - 1)
    lane = pos.astype(jnp.int32) % db_tile
    ids = (jmax - (packed & jmax)) * db_tile + lane
    vals = jax.lax.bitcast_convert_type(
        _ordered_int(packed & ~jmax), jnp.float32
    )
    empty = packed == INT32_MIN
    return (
        jnp.where(empty, NEG_INF, vals),
        jnp.where(empty, -1, ids),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "r_slots", "metric", "db_tile", "query_block", "interpret",
        "sym", "two_level",
    ),
)
def _packed_candidates_topk_sq8(
    db_i8, sc_tiles, queries, k, r_slots, metric, db_tile, query_block,
    interpret, n_valid=None, sym=False, two_level=False,
):
    """SQ8 packed kernel + shared epilogue. `db_i8` [N, d] int8 (rows
    already padded to db_tile), `sc_tiles` [1, N] f32 per-row dequant
    scales (a 1-row layout: Mosaic accepts a (1, db_tile) block only when
    the sublane dim equals the whole array's; pad rows carry scale 1 and
    are masked via n_valid). `sym` quantises the queries too and scores
    on the int8 MXU path (ip/cosine only); `two_level` adds the residual
    query pass (sq8-sym2 — see the kernel docstring)."""
    n, d = db_i8.shape
    q_n = queries.shape[0]

    q_lo = None
    if sym:
        from .graph_pallas import quantize_int8

        q32 = queries.astype(jnp.float32)
        q8, qsc = quantize_int8(q32)
        q_p = pad_rows(q8, query_block)
        if two_level:
            # residual quantised at exactly qsc/128: codes <= 64, and the
            # fixed ratio keeps the kernel's combine a constant
            resid = q32 / qsc[:, None] - q8.astype(jnp.float32)
            q_lo = pad_rows(
                jnp.round(resid * 128.0).astype(jnp.int8), query_block
            )
    else:
        q_p = pad_rows(queries, query_block).astype(jnp.bfloat16)
    n_tiles = n // db_tile
    jbits = max(1, (n_tiles - 1).bit_length())
    grid = (q_p.shape[0] // query_block, n_tiles)
    width = r_slots * db_tile

    nv = jnp.full((1,), n if n_valid is None else n_valid, jnp.int32)
    q_spec = pl.BlockSpec(
        (query_block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    extra_args, extra_specs = (), ()
    if sym:
        kernel = functools.partial(
            _segment_packed_sq8sym_kernel,
            r_slots=r_slots, n_db=n, jbits=jbits, two_level=two_level,
        )
        if two_level:
            extra_args, extra_specs = (q_lo,), (q_spec,)
    else:
        kernel = functools.partial(
            _segment_packed_sq8_kernel,
            r_slots=r_slots, metric=metric, n_db=n, jbits=jbits,
        )
    buf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec,
            *extra_specs,
            pl.BlockSpec(
                (db_tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, db_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (query_block, width), lambda i, j: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q_p.shape[0], width), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=(4 if two_level else 2) * q_p.shape[0] * n * d,
            bytes_accessed=(
                q_p.shape[0] * d * (2 if two_level else 1 if sym else 2)
                + grid[0] * n * (d + 4)
                + q_p.shape[0] * width * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, q_p, *extra_args, db_i8, sc_tiles)
    vals, ids = _decode_packed(buf[:q_n], k, db_tile, jbits)
    if sym:
        # per-query dequant scale: rank-neutral, folded in after decode
        # (-inf empty slots stay -inf under a positive scale)
        vals = vals * qsc[:, None]
    return vals, ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "db_tile", "query_block", "interpret",
        "highest_precision", "recall_target", "storage",
    ),
)
def packed_pallas_topk(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    n_valid=None,  # traced scalar ok (shard pad masking)
    db_tile: int = None,
    query_block: int = 512,
    interpret: bool = None,
    highest_precision: bool = None,
    recall_target: float = 0.95,
    storage: str = "native",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k via the packed segment-top-R kernel (the flat
    engine's production regime — the role FAISS HNSW/LSH play in the
    reference, pfam/proteins_search.py:26-49, at measured-higher recall).

    Per-segment slot count R comes from the Poisson loss bound for
    `recall_target` (r_for_recall). Returned values carry the packed
    encoding's truncation (< 2^jbits f32 ulps, ~1e-5 relative at the
    headline shape); ids are exact for the candidates kept. Safe under
    jit/shard_map; `n_valid` masks pad rows on sharded callers.

    `storage="sq8"` streams the database as int8 rows + per-row f32
    dequant scales (FAISS SQ8): HALF the HBM traffic per database pass on
    this restream-bound engine, at ~1.4× the bf16 dot noise (returned
    values then carry the quantisation error too). `"sq8-sym"` quantises
    the queries too and scores on the MXU's native int8×int8→int32 path
    at 2× the bf16 MAC rate (ip/cosine; l2 silently uses the asymmetric
    kernel). `"sq8-sym2"` adds a second int8 pass over the residual
    query (q ≈ q_hi + q_lo/128, both dots exact in int32): 16-bit-quality
    scores at 2× the sym MAC cost and the SAME db stream — the
    recall ≥0.99 operating mode (storage quantisation becomes the only
    noise beyond the Poisson slot loss). Repeated-search callers can pass
    `db` as an `SQ8Database` (quantize_database) to skip the per-call
    quantisation passes."""
    prequant = isinstance(db, SQ8Database)
    if prequant:
        if storage == "native":
            storage = "sq8-sym" if metric != "l2" else "sq8"
        n = db.n
        d = db.db_i8.shape[1]
    else:
        db = jnp.asarray(db)
        n, d = db.shape
    queries = jnp.asarray(queries)
    q_n = queries.shape[0]
    if q_n == 0:
        return jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if highest_precision is None:
        highest_precision = not prequant and db.dtype == jnp.float32
    k_eff = min(k, n)
    if db_tile is None:
        # v5e sweep: W=256/qb=512 → 342k q/s at measured recall 0.981 vs
        # W=1024/qb=256's 264k (see default_plan_inputs)
        db_tile = default_plan_inputs(n, k_eff, exact=False)[0]
    sq8 = storage in ("sq8", "sq8-sym", "sq8-sym2")
    sym = storage in ("sq8-sym", "sq8-sym2")
    two_level = storage == "sq8-sym2"
    if storage not in ("native", "sq8", "sq8-sym", "sq8-sym2"):
        raise ValueError(f"unknown storage {storage!r}")
    if sym and metric == "l2":
        # the query scale enters l2's 2qd−|q|²−|d|² combination per row —
        # not a rank-neutral epilogue factor — so l2 keeps the asymmetric
        # kernel (bf16 queries, int8 db)
        sym = two_level = False
    db_tile, query_block, r_slots, max_block = _plan(
        n, d, k_eff, db_tile, query_block, DEFAULT_R, False, recall_target,
        1 if sq8 else db.dtype.itemsize,
    )
    if sq8:
        if prequant:
            db_i8, scales = db.db_i8, db.scales
        else:
            if db.dtype == jnp.int8:
                raise ValueError(
                    "storage='sq8' quantises internally; pass the float"
                    " database (or an SQ8Database from quantize_database)"
                )
            from .graph_pallas import quantize_int8

            db_i8, scales = quantize_int8(db.astype(jnp.float32))
        db_i8 = pad_rows(db_i8, db_tile)
        n_pad = db_i8.shape[0]
        sc_tiles = jnp.pad(
            scales, (0, n_pad - n), constant_values=1.0
        ).reshape(1, n_pad)
        nv_sq8 = jnp.asarray(n, jnp.int32) if n_valid is None else n_valid
    vals_out, ids_out = [], []
    for s in range(0, q_n, max_block):
        if sq8:
            vals, ids = _packed_candidates_topk_sq8(
                db_i8, sc_tiles, queries[s : s + max_block], k_eff, r_slots,
                metric, db_tile, query_block, interpret, nv_sq8, sym=sym,
                two_level=two_level,
            )
        else:
            vals, ids = _packed_candidates_topk(
                db, queries[s : s + max_block], k_eff, r_slots, metric,
                db_tile, query_block, interpret, highest_precision, n_valid,
            )
        vals_out.append(vals)
        ids_out.append(ids)
    vals = (
        vals_out[0] if len(vals_out) == 1
        else jnp.concatenate(vals_out, axis=0)
    )
    ids = ids_out[0] if len(ids_out) == 1 else jnp.concatenate(ids_out, axis=0)
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, ids


def plan_fingerprint(
    n: int, d: int, k: int, exact: bool = False,
    storage: str = "native", recall_target: float = 0.95,
    itemsize: int = 2,
) -> dict:
    """The kernel shape the public entry points would pick — recorded in
    bench JSON so documented headline numbers carry their exact config
    (W / qb / R / storage) and silent planner drift shows up in the
    artifact (VERDICT r3 #6)."""
    k_eff = min(k, n)
    db_tile0, query_block0 = default_plan_inputs(n, k_eff, exact)
    sq8 = storage in ("sq8", "sq8-sym", "sq8-sym2", "sq8-pq", "sq8-pq2")
    db_tile, query_block, r_slots, _ = _plan(
        n, d, k_eff, db_tile0, query_block0,
        None if exact else DEFAULT_R, exact, recall_target,
        1 if sq8 else itemsize,
    )
    return {
        "db_tile": db_tile,
        "query_block": query_block,
        "r_slots": r_slots,
        "storage": storage,
    }


def _poisson_tail(lam: float, r: int) -> float:
    """P(X >= r) for X ~ Poisson(lam)."""
    import math

    cdf = 0.0
    term = math.exp(-lam)
    for x in range(0, r):
        cdf += term
        term = term * lam / (x + 1)
    return max(0.0, 1.0 - cdf)


def r_for_exact(
    k: int, db_tile: int, per_row_target: float = 3e-3
) -> int:
    """Smallest per-segment slot count R whose expected certificate-failure
    rate (suspect rows needing the rescue pass) stays under
    `per_row_target`: a row flags iff some segment holds >= R of its
    top-k, segments fill ~Poisson(k/W), and there are W segments. Narrow
    segments (small W) give small per-query state — the engine's
    restream-bound throughput lever — at the cost of a larger R."""
    lam = max(k / db_tile, 1e-9)
    for r in range(max(2, int(lam) + 1), 65):
        if _poisson_tail(lam, r) * db_tile <= per_row_target:
            return r
    return 64


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
    db_tile: int = None,  # None → k-adaptive (see below)
    query_block: int = 320,
    r_slots: int = None,  # None → Poisson suspect-rate bound (r_for_exact)
    interpret: bool = None,
    highest_precision: bool = None,
    exact: bool = True,
    recall_target: float = 0.95,
    packed: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the whole database (large-k fast path).

    db [N, d], queries [Q, d]. Returns (sims [Q, k] descending, ids [Q, k]
    int32) bit-identical to `lax.top_k` over the same similarity rows
    (internal convention of ops/distance.py; l2 = 2qd - |q|^2 - |d|^2).
    k > N pads with (-inf, -1) like FAISS's missing-hit sentinel.

    `highest_precision` defaults to fp32-inputs => HIGHEST (FAISS-parity,
    per CLAUDE.md) and bf16 inputs => DEFAULT (fp32 MXU accumulation).
    `exact=False` routes to the packed int32 kernel (packed_pallas_topk)
    unless `packed=False` keeps the f32+id kernel in its recall regime.
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
    if not exact and packed:
        return packed_pallas_topk(
            db, queries, k, metric=metric, db_tile=db_tile,
            query_block=query_block, interpret=interpret,
            highest_precision=highest_precision,
            recall_target=recall_target,
        )
    k_eff = min(k, n)
    if db_tile is None:
        # measured at n=131k/k=1000: W=256/R=15/qb=160 → 113.9k q/s vs
        # W=1024/R=8/qb=64's 62k (see default_plan_inputs)
        db_tile = default_plan_inputs(n, k_eff, exact=True)[0]

    # under a jit/shard_map trace the host-side certificate handling
    # (np.asarray on `suspect`) cannot run — transparently defer to the
    # fully-traceable variant (identical kernel shapes via the shared
    # _plan; its fallback is a lax.cond)
    if isinstance(db, jax.core.Tracer) or isinstance(
        queries, jax.core.Tracer
    ):
        return exact_pallas_topk_traced(
            db, queries, k, metric=metric, db_tile=db_tile,
            query_block=query_block,
            # None lets the traced variant pick its stricter slot default
            # (its suspect fallback recomputes the whole block)
            r_slots=r_slots,
            interpret=interpret,
            highest_precision=highest_precision, exact=exact,
            recall_target=recall_target,
        )

    db_tile, query_block, r_slots, max_block = _plan(
        n, d, k_eff, db_tile, query_block, r_slots, exact, recall_target,
        db.dtype.itemsize,
    )
    # all chunks stay ON DEVICE, including the suspect flags — the rescue
    # below then needs exactly ONE host fetch for the whole call (a fetch
    # per chunk was 34 relay round-trips at bench scale, and a rescue run
    # per chunk re-streamed the database 34 extra times)
    vals_out, ids_out, suspect_out = [], [], []
    for s in range(0, q_n, max_block):
        v, i, sus = _candidates_and_topk(
            db, queries[s : s + max_block], k_eff, r_slots, metric,
            db_tile, query_block, interpret, highest_precision,
        )
        vals_out.append(v)
        ids_out.append(i)
        suspect_out.append(sus)
    if len(vals_out) == 1:
        vals, ids, suspect = vals_out[0], ids_out[0], suspect_out[0]
    else:
        vals = jnp.concatenate(vals_out, axis=0)
        ids = jnp.concatenate(ids_out, axis=0)
        suspect = jnp.concatenate(suspect_out, axis=0)

    flagged = (
        np.flatnonzero(np.asarray(suspect)) if exact else np.empty(0, int)
    )
    if flagged.size:
        # Exactness fallback (a segment held >= R of a row's top-k;
        # ~1% of rows at k=1000/W=1024 — the max-load tail of 1000 balls
        # in 1024 bins). Re-run JUST those rows through the same kernel
        # with doubled slots (suspect probability ~0 at 2R; measured far
        # cheaper than the old full-row-sort fallback, which cost ~0.5 s
        # per bench run); an oneshot sort remains the depth-2 safety net.
        # pad the rescue batch to a power-of-two row count: every distinct
        # flagged count would otherwise compile a fresh kernel shape
        # (~34 query chunks x ~1% flagged each = dozens of compiles)
        m = 1 << (int(flagged.size) - 1).bit_length()
        sub = queries[np.pad(flagged, (0, m - flagged.size))]
        if r_slots < 32:
            f_vals, f_ids = exact_pallas_topk(
                db, sub, k_eff, metric=metric, db_tile=db_tile,
                query_block=query_block, r_slots=2 * r_slots,
                interpret=interpret, highest_precision=highest_precision,
            )
        else:
            from .topk import oneshot_topk

            f_vals, f_ids = oneshot_topk(db, sub, k_eff, metric=metric)
        vals = jnp.asarray(vals).at[flagged].set(f_vals[: flagged.size])
        ids = jnp.asarray(ids).at[flagged].set(f_ids[: flagged.size])

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
    db_tile: int = None,
    query_block: int = 512,
    r_slots: int = None,
    interpret: bool = None,
    highest_precision: bool = None,
    exact: bool = True,
    recall_target: float = 0.95,
    packed: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-jittable segment-top-R top-k — safe inside shard_map/jit.

    Same math as exact_pallas_topk, but the exactness fallback is a
    `lax.cond` over an O(k)-memory streaming recompute of the WHOLE query
    block (instead of host-side suspect-row selection, which round-trips
    through numpy and cannot trace). Because ANY suspect row triggers the
    whole-block recompute here, the slot default uses a much stricter
    suspect-rate bound (1e-6 per row) than the host variant's (3e-3,
    where per-row patch-up is cheap).
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
    if not exact and packed:
        return packed_pallas_topk(
            db, queries, k, metric=metric, n_valid=n_valid,
            db_tile=db_tile, query_block=query_block, interpret=interpret,
            highest_precision=highest_precision,
            recall_target=recall_target,
        )
    if db_tile is None:
        db_tile = default_plan_inputs(n, k_eff, exact=True)[0]
    db_tile, query_block, r_slots, max_block = _plan(
        n, d, k_eff, db_tile, query_block, r_slots, exact, recall_target,
        db.dtype.itemsize, exact_row_target=1e-6,
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
