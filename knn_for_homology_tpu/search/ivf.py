"""IVF (inverted-file) ANN index — the TPU-native sub-linear search.

Plays the role of FAISS IndexHNSWFlat in the reference
(pfam/proteins_search.py:30-49: M=42, efSearch=256, k=1000) but with a
TPU-first design instead of a graph-traversal translation: HNSW's
pointer-chasing beam search is latency-bound gather work that TPUs hate,
while an IVF layout turns ANN into exactly the two things TPUs love —
one skinny routing matmul (queries x centroids on the MXU) followed by
contiguous-slab scoring (each probed cluster's members are stored
adjacently as int8 rows, streamed through the fused Pallas slab kernel).
This is the ScaNN-family recipe; clusters are capped at 128 members so a
cluster IS a `ops/graph_pallas.beam_expand` slab ("node" = cluster,
"neighbours" = members) and the graph engine's DMA kernel is reused
verbatim.

Properties vs the judged HNSW-parity criteria (VERDICT r2 #3):
  * equal memory — storage is ONE int8 copy of the vectors (padded to the
    capacity grid) + per-row dequant scales + member ids + centroids:
    ~0.31 GB at n=131k/d=1024 vs FAISS HNSW's ~0.56 GB (fp32 vectors +
    M=42 links). No per-node vector slabs.
  * large k — k=1000 just means probing more clusters (nprobe * 128
    candidate slots); sub-linear work per query at any k, where a graph
    beam must serially widen.

Exactness note: kernel scores are int8-symmetric-quantised (per-row
scales, ~0.4% row-norm error); the final top-k is exactly rescored in
fp32 by default for k <= `RESCORE_MAX_K` (the reference's index returns
fp32 scores).
"""

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..ops.distance import finalize_scores, l2_normalize
from ..ops import graph_pallas as gp

logger = logging.getLogger(__name__)

CAPACITY = gp.LANE  # cluster capacity == the slab kernel's 128-lane row


def _route_sims(queries, centroids, metric):
    """[Q, C] bigger-is-better routing similarities (bf16 MXU)."""
    dots = jnp.einsum(
        "qd,cd->qc",
        queries.astype(jnp.bfloat16),
        centroids.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        c_sq = jnp.sum(
            jnp.square(centroids.astype(jnp.float32)), axis=-1
        )
        return 2.0 * dots - c_sq[None, :]
    return dots


@functools.partial(jax.jit, static_argnames=("metric", "p", "block"))
def _route_prefs_blocked(db, centroids, metric, p, block):
    """[N, p] ranked nearest-centroid preferences in row blocks: top_k
    forces the [rows, C] similarity matrix to materialise (unlike the
    k-means argmax, which XLA fuses into the assignment matmul), and the
    all-at-once [N, C] f32 matrix is 68 GB at n=2^20/c=16k — HBM OOM.
    lax.map bounds the transient at [block, C]."""
    n = db.shape[0]
    pad = -n % block
    db_p = jnp.pad(db, ((0, pad), (0, 0)))
    blocks = db_p.reshape(-1, block, db.shape[1])

    def one(v):
        return jax.lax.top_k(_route_sims(v, centroids, metric), p)[1]

    return jax.lax.map(one, blocks).reshape(-1, p)[:n]


def _route_prefs(db, centroids, metric, p):
    c = centroids.shape[0]
    n = db.shape[0]
    # [block, C] f32 transient <= ~256 MB ...
    block = max(256, (1 << 26) // max(c, 1))
    # ... but also cap the lax.map trip count at 256: compile latency on
    # this stack scales steeply with scan length (CLAUDE.md), so huge
    # builds trade a larger transient (up to ~1 GB at n=2^22/c=16k) for a
    # bounded scan (ADVICE r3)
    block = int(min(max(n, 1), max(block, -(-n // 256))))
    return _route_prefs_blocked(db, centroids, metric, p, block)


@functools.partial(jax.jit, static_argnames=("metric_is_l2",))
def _kmeans_assign(v, centroids, metric_is_l2: bool = False):
    dots = jnp.einsum(
        "nd,cd->nc", v, centroids, preferred_element_type=jnp.float32
    )
    if metric_is_l2:
        c_sq = jnp.sum(jnp.square(centroids), axis=-1)
        dots = 2.0 * dots - c_sq[None, :]
    return jnp.argmax(dots, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("metric", "reseed"))
def _kmeans_step(v, centroids, metric: str, reseed: bool):
    """One Lloyd iteration, fully on device with STATIC shapes: assignment
    matmul + segment-sum update, then (reseed=True) every empty cluster is
    re-seeded at a poorly-covered row — rows whose best-centroid
    similarity is lowest mark structure no cell covers yet (the FAISS
    empty-cluster repair, by coverage rather than by splitting the largest
    cell, because an uncovered tight cluster IS the lowest-similarity
    region). Without repair, data with more natural clusters than
    surviving centroids strands whole clusters in far-away cells that
    routing can never select (measured recall@10 0.16 at n=131k with 2048
    tight clusters; ~1 after repair)."""
    n, _ = v.shape
    c = centroids.shape[0]
    dots = jnp.einsum(
        "nd,cd->nc", v, centroids, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        c_sq = jnp.sum(jnp.square(centroids), axis=-1)
        dots = 2.0 * dots - c_sq[None, :]
    assign = jnp.argmax(dots, axis=-1).astype(jnp.int32)
    sums = jax.ops.segment_sum(v, assign, num_segments=c)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), assign, num_segments=c
    )
    fresh = sums / jnp.maximum(counts, 1.0)[:, None]
    if metric == "cosine":
        fresh = l2_normalize(fresh)
    centroids = jnp.where((counts > 0)[:, None], fresh, centroids)
    if reseed:
        best = jnp.max(dots, axis=-1)  # [N] per-row coverage
        k_cand = min(c, n)
        _, worst = jax.lax.top_k(-best, k_cand)  # worst-covered rows
        empty = counts <= 0  # [C]
        n_empty = jnp.sum(empty.astype(jnp.int32))
        # spread the picks across the worst-row list: consecutive worst
        # rows are usually members of the SAME uncovered cluster, and one
        # reseed per cluster is enough
        rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # index among empties
        stride = jnp.maximum(k_cand // jnp.maximum(n_empty, 1), 1)
        pick = jnp.clip(rank * stride, 0, k_cand - 1)
        centroids = jnp.where(empty[:, None], v[worst[pick]], centroids)
    return centroids, counts


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "iters", "metric")
)
def _kmeans(v, n_clusters: int, iters: int, metric: str):
    """Lloyd refinement of a strided init — one MXU assignment matmul +
    one segment-sum per pass, entirely on device, with empty-cluster
    reseeding at every step but the last (so the returned centroids'
    assignment is consistent with their final update). The whole
    iteration loop runs in ONE jit (lax.fori_loop): per-step dispatch
    through the axon relay measured ~1 s/iteration — 16 s of the old
    build time for ~10 ms/iteration of actual compute."""
    n = v.shape[0]
    step = max(n // n_clusters, 1)
    centroids = v[::step][:n_clusters]
    if iters <= 0:
        return centroids
    if iters > 1:
        centroids = jax.lax.fori_loop(
            0,
            iters - 1,
            lambda i, cent: _kmeans_step(v, cent, metric, reseed=True)[0],
            centroids,
        )
    return _kmeans_step(v, centroids, metric, reseed=False)[0]


@functools.partial(jax.jit, static_argnames=("n_clusters", "capacity"))
def _balanced_members(order2, n_clusters: int, capacity: int):
    """[C, capacity] member ids (-1 padded) from each row's ranked cluster
    preferences `order2` [N, P]: pass p assigns every still-free row to
    its rank-p cluster if space remains (row-id order breaks ties), then
    leftovers spill into the globally free slots. Every row is stored
    exactly once — capacity overflow must lose candidates, not rows.

    Entirely on device: the old host implementation needed `order2`
    fetched through the axon relay tunnel, and that 2 MB fetch measured
    anywhere from 30 to 600 s (the dominant, wildly variable IVF build
    cost). Per pass: stable-sort rows by wanted cluster, rank-in-group
    via searchsorted-against-self, capacity test, one scatter. The spill
    maps the r-th leftover row to the r-th globally free slot via a
    cumulative-free-count searchsorted."""
    n, p_max = order2.shape
    c = n_clusters
    rows = jnp.arange(n, dtype=jnp.int32)
    assigned = jnp.full((n,), -1, jnp.int32)
    counts = jnp.zeros((c,), jnp.int32)
    # flat member table + one overflow slot that absorbs masked scatters
    members_flat = jnp.full((c * capacity + 1,), -1, jnp.int32)

    for p in range(p_max):
        free = assigned < 0
        want = jnp.where(free, order2[:, p].astype(jnp.int32), c)
        perm = jnp.argsort(want)  # stable: groups by cluster, row order
        want_s = want[perm]
        grp_start = jnp.searchsorted(want_s, want_s, side="left")
        rank = rows - grp_start  # position within the contender group
        counts_ext = jnp.concatenate(
            [counts, jnp.zeros((1,), jnp.int32)]
        )
        space_s = jnp.where(
            want_s == c, 0, capacity - counts_ext[want_s]
        )
        take = rank < space_s
        slot = counts_ext[jnp.minimum(want_s, c - 1)] + rank
        idx = jnp.where(
            take, want_s * capacity + slot, c * capacity
        )
        members_flat = members_flat.at[idx].set(
            jnp.where(take, perm, -1)
        )
        assigned = assigned.at[perm].set(
            jnp.where(take, want_s, assigned[perm])
        )
        counts = counts + jax.ops.segment_sum(
            take.astype(jnp.int32),
            jnp.where(take, want_s, c),
            num_segments=c + 1,
        )[:c]

    # spill: r-th leftover row (row order) -> r-th globally free slot
    left = assigned < 0
    spill_rank = jnp.cumsum(left.astype(jnp.int32)) - 1
    free_cnt = capacity - counts
    cum = jnp.cumsum(free_cnt)
    cl = jnp.clip(
        jnp.searchsorted(cum, spill_rank, side="right"), 0, c - 1
    )
    prev = jnp.where(cl > 0, cum[jnp.maximum(cl - 1, 0)], 0)
    slot = spill_rank - prev + counts[cl]
    ok = left & (spill_rank < cum[c - 1])
    idx = jnp.where(ok, cl * capacity + slot, c * capacity)
    members_flat = members_flat.at[idx].set(jnp.where(ok, rows, -1))
    return members_flat[: c * capacity].reshape(c, capacity)


def _route_topk(sims, nprobe: int, approx: bool):
    """Top-nprobe cell selection. `approx` uses the TPU PartialReduce op
    (jax.lax.approx_max_k) — measured 2-3× cheaper than the exact sort-
    based top_k at nprobe=256 over 16k cells, and probe sets only need to
    be good, not exact (a swapped marginal probe perturbs recall ~like
    the routing matmul's bf16 noise already does). recall_target 0.99
    per element keeps the perturbation below the index-level targets."""
    if approx and nprobe < sims.shape[-1]:
        return jax.lax.approx_max_k(sims, nprobe, recall_target=0.99)[1]
    return jax.lax.top_k(sims, nprobe)[1]


@functools.partial(
    jax.jit, static_argnames=("metric", "nprobe", "route_approx")
)
def _block_union_counts(
    q_blocks, centroids, metric: str, nprobe: int, route_approx: bool = False
):
    """([B] distinct-probed-cell counts, [B, qb, nprobe] probe selections)
    — computed for ALL blocks in one device call so the union-scan loop
    needs ONE host sync total instead of one per block (each scalar fetch
    through the axon relay costs tens of ms; at 8 blocks per search call
    the syncs rivalled the scan itself). The selections are returned so
    the scan pass reuses them instead of routing a second time (the
    routing pass was half the remaining per-block cost once the union
    gather was fused away, scripts/profile_ivf_union.py r5)."""
    c = centroids.shape[0]

    def one(q):
        route = _route_sims(q, centroids, metric)
        sel = _route_topk(route, nprobe, route_approx).astype(jnp.int32)
        probed = jnp.zeros((c,), jnp.int32).at[sel.reshape(-1)].set(1)
        return jnp.sum(probed), sel

    # lax.map, not vmap: vmap materialises every block's [qb, C] routing
    # matrix at once — 4.3 GB at 65k queries x 16k cells, an HBM OOM
    # beside a 1M-row index; mapping keeps one block's transient live
    return jax.lax.map(one, q_blocks)


@functools.partial(jax.jit, donate_argnums=(0,))
def _chunk_write(buf, chunk, start):
    """In-place (donated) chunk write into a preallocated device buffer —
    the functional .at[].set would hold TWO copies of the big array at
    every streamed-build step."""
    return jax.lax.dynamic_update_slice(
        buf, chunk.astype(buf.dtype), (start,) + (0,) * (buf.ndim - 1)
    )


_BIAS_BIG = 3.0e4  # pad-row knockout; |real scores| << this at any metric


@functools.partial(jax.jit, static_argnames=("metric",))
def _gather_bias_buffer(pv, pi, sc, row_sq, cells_sel, metric: str):
    """Gather the selected cells' int8 slabs into one contiguous
    dequantised bf16 buffer with a BIAS LANE appended (lane d = 0 for real
    rows, -_BIAS_BIG for capacity-padding rows; queries carry 1.0 there),
    so the flat segment-top-R engine can scan the union without pad rows
    ever reaching the top-k — a zero pad row would otherwise score 0.0,
    which beats genuinely negative similarities. The lane block is 128
    wide (Mosaic lane alignment); +12.5% bytes at d=1024 buys exact pad
    semantics with no kernel change. For l2 the row vectors are doubled
    and the bias lane carries -|row|^2, making the engine's raw dot equal
    2qd - |row|^2 (the -|q|^2 term is per-query, added by the caller)."""
    c_total, lane = pi.shape
    d = pv.shape[1]
    budget = cells_sel.shape[0]
    gids = pi[cells_sel].reshape(-1)  # [B*lane]
    rows8 = pv.reshape(c_total, lane, d)[cells_sel].reshape(-1, d)
    scales = sc[cells_sel].reshape(-1)
    rows = rows8.astype(jnp.bfloat16) * scales[:, None].astype(jnp.bfloat16)
    if metric == "l2":
        rows = 2.0 * rows
        content = -row_sq[cells_sel].reshape(-1)
    else:
        content = jnp.zeros((budget * lane,), jnp.float32)
    bias = jnp.where(gids >= 0, content, -_BIAS_BIG).astype(jnp.bfloat16)
    pad = jnp.zeros((budget * lane, 127), jnp.bfloat16)
    buf = jnp.concatenate([rows, bias[:, None], pad], axis=1)
    return buf, gids


# pad-row scale for the int8 union buffer: (-127 bias)·(127 query bias)·
# this ≈ -1.6e22 — below every real score, far from f32 overflow even
# after the per-query dequant scale multiplies in
_PAD_SCALE = 1.0e18


@jax.jit
def _gather_int8_buffer(pv, pi, sc, cells_sel):
    """int8 variant of _gather_bias_buffer (cosine/ip): the gathered slabs
    STAY int8 — half the gather traffic and the scan runs on the MXU's
    native int8 path via the sq8-sym kernel. Pad semantics ride the same
    appended bias lane, in integer form: real rows carry bias 0 and their
    true dequant scale; capacity-pad rows carry bias −127 and scale
    _PAD_SCALE, so their score is ≈ −1.6e22 after the (query-bias = the
    query's own max|q|, which quantises to exactly 127 without touching
    the query's scale) product — no kernel change, no f32 materialisation.
    l2 keeps the bf16 buffer (its bias lane carries −|row|², which int8
    cannot hold)."""
    c_total, lane = pi.shape
    d = pv.shape[1]
    budget = cells_sel.shape[0]
    gids = pi[cells_sel].reshape(-1)  # [B*lane]
    rows8 = pv.reshape(c_total, lane, d)[cells_sel].reshape(-1, d)
    real = gids >= 0
    scales = jnp.where(
        real, sc[cells_sel].reshape(-1), jnp.float32(_PAD_SCALE)
    )
    bias = jnp.where(real, jnp.int8(0), jnp.int8(-127))
    pad = jnp.zeros((budget * lane, 127), jnp.int8)
    buf8 = jnp.concatenate([rows8, bias[:, None], pad], axis=1)
    return buf8, scales, gids


def _exact_rescore_rows(db, q, ids, metric: str):
    """fp32 re-scoring of final candidates (quantisation-free
    caller-visible scores, like the graph engine's epilogue)."""
    safe = jnp.clip(ids, 0, db.shape[0] - 1)
    rows = db[safe]  # [q, k, d]
    s = jnp.einsum(
        "qkd,qd->qk", rows, q, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        r_sq = jnp.sum(jnp.square(rows), axis=-1)
        q_sq = jnp.sum(jnp.square(q), axis=-1)
        s = 2.0 * s - r_sq - q_sq[:, None]
    return jnp.where(ids >= 0, s, -jnp.inf)


def _slab_rescore_rows(pv, sc, row_sq, slot, q, ids, metric: str):
    """fp32 re-scoring of final candidates from the DEQUANTISED int8
    slabs — the lean (store_fp32=False) analog of _exact_rescore_rows.
    The union scan's bf16 matmul (and double-sided int8 quantisation on
    the large-union path) carries ~0.4%-of-score noise; re-scoring the
    shortlist in fp32 against the dequantised stored rows removes the
    COMPUTE noise, leaving only the one-sided storage quantisation error
    (~0.07% at d=128) — below typical within-cluster neighbour gaps, so
    small-k ordering survives without keeping any fp32 rows."""
    safe = jnp.clip(ids, 0, slot.shape[0] - 1)
    srows = slot[safe]  # [q, k] packed slot index
    # slabs are lane-padded to a 128 multiple at pack time; slice back
    rows = (
        pv[srows][..., : q.shape[1]].astype(jnp.float32)
        * sc.reshape(-1)[srows][..., None]
    )
    s = jnp.einsum(
        "qkd,qd->qk", rows, q, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        # the exact fp32 row norms survive the lean build (_row_sq)
        s = (
            2.0 * s
            - row_sq.reshape(-1)[srows]
            - jnp.sum(jnp.square(q), axis=-1)[:, None]
        )
    return jnp.where(ids >= 0, s, -jnp.inf)


# _union_rescore_matmul buffer/score-matrix byte caps: above these the
# rescore falls back to the per-(query, candidate) row gather (chunked
# over query sub-blocks, so the fallback is qb-independent too)
_MATMUL_RESCORE_BUF_MAX = 1 << 31
_MATMUL_RESCORE_SCORES_MAX = 1 << 31

# per-dispatch transient budget for the chunked row-gather rescores
_RESCORE_CHUNK_BYTES = 2 << 30


def _map_rescore(fn, q, ids, per_query_bytes: int):
    """Run a row-gather rescore over query SUB-BLOCKS (lax.map) so its
    [chunk, shortlist, d] gather transient stays under
    _RESCORE_CHUNK_BYTES no matter how large the union-scan query block
    is. This is what lets plan_blocks keep qb large — the rescore pass's
    FIXED per-block costs (union fp32 gather, routing epilogue) then
    amortise over 4-16x more queries (the measured wall at the
    high-recall n=2^20 point, scripts/profile_ivf_union.py)."""
    qb = q.shape[0]
    chunk = max(64, 1 << max(
        _RESCORE_CHUNK_BYTES // max(per_query_bytes, 1), 1
    ).bit_length() - 1)
    if qb <= chunk:
        return fn(q, ids)
    g = -(-qb // chunk)
    pad = g * chunk - qb
    if pad:
        q = jnp.concatenate(
            [q, jnp.broadcast_to(q[-1:], (pad, q.shape[1]))]
        )
        ids = jnp.concatenate(
            [ids, jnp.broadcast_to(ids[-1:], (pad, ids.shape[1]))]
        )
    out = jax.lax.map(
        lambda t: fn(t[0], t[1]),
        (q.reshape(g, chunk, -1), ids.reshape(g, chunk, -1)),
    )
    return out.reshape(g * chunk, -1)[:qb]


def _union_rescore_matmul(db, q, pi, cells_sel, pos, ids, metric: str):
    """fp32 re-scoring of the shortlist WITHOUT the per-(query, candidate)
    row gather: gather the union's fp32 rows ONCE ([budget*lane, d] —
    ~shortlist/lane-fill times fewer gathered rows than
    _exact_rescore_rows' [qb, shortlist] gather), score every
    (query, union row) pair on the MXU, and pick the shortlist's scores
    by buffer position. Same fp32 rows + same einsum class as
    _exact_rescore_rows, so caller-visible scores are numerically
    equivalent; the row-gather OP overhead (not its bytes) was the
    measured wall at the high-recall point (benchmarks/r4_campaigns.md)."""
    gids = pi[cells_sel].reshape(-1)
    safe = jnp.clip(gids, 0, db.shape[0] - 1)
    buf = db[safe]  # [budget*lane, d] f32, slab-ordered
    s = jnp.einsum(
        "qd,bd->qb", q, buf, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        r_sq = jnp.sum(jnp.square(buf), axis=-1)
        q_sq = jnp.sum(jnp.square(q), axis=-1)
        s = 2.0 * s - r_sq[None, :] - q_sq[:, None]
    vals = jnp.take_along_axis(s, pos, axis=1)
    return jnp.where(ids >= 0, vals, -jnp.inf)


def _union_scan_one(
    q, centroids, pv, pi, sc, row_sq, db, slot, *,
    metric, k_eff, nprobe, shortlist, rescore, budget, int8_min_rows,
    compute="sym", route_approx=False, sel=None,
):
    """One query block through the batched union scan (traceable; static
    `budget` cells). See IVFIndex docstring for the path's rationale.
    `sel` accepts precomputed probe selections (callers that already
    routed, e.g. to size the budget). `rescore` is a static mode:
    False, "db" (fp32 rows; True is accepted as an alias), or "slab"
    (dequantised-slab rescore for the lean layout — `slot` maps global
    ids to packed rows; pass a length-0 placeholder otherwise)."""
    from ..ops.exact_pallas import exact_pallas_topk

    if rescore is True:
        rescore = "db"

    c = centroids.shape[0]
    d = db.shape[1]
    if sel is None:
        route = _route_sims(q, centroids, metric)
        sel = _route_topk(route, nprobe, route_approx)
    # cells ranked by POPULARITY (how many of the block's queries probe
    # them): with a host-sized budget (>= the true union) this selects
    # exactly the probed cells, same as a bitmap; with a caller-fixed
    # budget smaller than the union (the traced/sharded fast path) the
    # dropped cells are the least-popular ones — graceful recall decay.
    # The tail of the budget window may carry unprobed cells — scanning
    # them only ADDS true candidates. Counts are exact in f32 (<= 2^24),
    # so the approx selection can only shuffle equal-count ties plus its
    # own ~1% per-element loss — covered by the same argument.
    probed = jnp.zeros((c,), jnp.int32).at[sel.reshape(-1)].add(1)
    if budget >= c:
        cells_sel = jnp.arange(c, dtype=jnp.int32)
    elif route_approx:
        cells_sel = jax.lax.approx_max_k(
            probed.astype(jnp.float32), budget, recall_target=0.99
        )[1].astype(jnp.int32)
    else:
        cells_sel = jax.lax.top_k(probed, budget)[1]
    q32 = q.astype(jnp.float32)
    if pv.shape[1] != q32.shape[1]:
        # slabs are lane-padded to a 128 multiple at pack time; zero query
        # columns keep every dot product unchanged
        q32 = jnp.pad(
            q32, ((0, 0), (0, pv.shape[1] - q32.shape[1]))
        )
    # ip/cosine scan the selected slabs IN PLACE through the indirect
    # sq8-sym kernel (ops/ivf_pallas.py): the union's bytes cross HBM
    # exactly once at stream rate instead of three times through an XLA
    # slab gather — the measured wall behind the r4 7-28× piece-vs-
    # pipeline gap (benchmarks/r4_campaigns.md:150-155). `int8_min_rows`
    # survives as an escape hatch (tests force the bf16 gather path with
    # 10**9); l2 keeps the gather path (its −|row|² bias lane has no
    # int8 encoding).
    int8_scan = metric != "l2" and budget * CAPACITY >= int8_min_rows
    if not int8_scan:
        buf, gids = _gather_bias_buffer(pv, pi, sc, row_sq, cells_sel, metric)
        ones = jnp.ones((q.shape[0], 1), jnp.float32)
        zeros = jnp.zeros((q.shape[0], 127), jnp.float32)
        q_aug = jnp.concatenate([q32, ones, zeros], axis=1)
        s = min(shortlist, buf.shape[0])
        # the engine's Poisson loss multiplies the routing loss, so pin
        # it well above the index-level target (routing dominates)
        vals, pos = exact_pallas_topk(
            buf, q_aug, s, metric="cosine", exact=False,
            recall_target=0.995, highest_precision=False,
        )
        ids = gids[pos]
    else:
        from ..ops.ivf_pallas import ivf_union_topk

        s = min(shortlist, budget * CAPACITY)
        vals, pos, ids = ivf_union_topk(
            pv, sc, pi, cells_sel, q32, s, recall_target=0.995,
            compute=compute,
        )
    vals = jnp.where(ids >= 0, vals, -jnp.inf)
    if metric == "l2":
        vals = vals - jnp.sum(jnp.square(q32[:, :d]), axis=-1)[:, None]
    if rescore:
        s_actual = ids.shape[1]
        if rescore == "slab":
            # dequantised slab rows transient: int8 gather + f32 rows
            vals = _map_rescore(
                lambda qq, ii: _slab_rescore_rows(
                    pv, sc, row_sq, slot, qq, ii, metric
                ),
                q, ids, s_actual * pv.shape[1] * 5,
            )
        elif (
            budget * CAPACITY * d * 4 <= _MATMUL_RESCORE_BUF_MAX
            and q.shape[0] * budget * CAPACITY * 4
            <= _MATMUL_RESCORE_SCORES_MAX
        ):
            vals = _union_rescore_matmul(
                db, q, pi, cells_sel, pos, ids, metric
            )
        else:
            vals = _map_rescore(
                lambda qq, ii: _exact_rescore_rows(db, qq, ii, metric),
                q, ids, s_actual * d * 4,
            )
        vals, order = jax.lax.top_k(vals, min(k_eff, vals.shape[1]))
        ids = jnp.take_along_axis(ids, order, axis=1)
    elif vals.shape[1] > k_eff:
        vals = vals[:, :k_eff]
        ids = ids[:, :k_eff]
    return vals, ids


def _dma_block_one(
    q, centroids, pv, pi, sc, row_sq, db, slot, *,
    metric, k_eff, nprobe, shortlist, rescore, max_probe, route_approx,
    interpret,
):
    """One query block through the per-probe DMA path (traceable): route,
    stream each query's own nprobe slabs through the double-buffered
    beam_expand kernel, top-k the candidate strip, optionally rescore.
    Shared by the eager per-block caller and the stacked scan below."""
    if rescore is True:
        rescore = "db"
    route = _route_sims(q, centroids, metric)
    sel = _route_topk(route, nprobe, route_approx)  # [q, nprobe]
    q_sq = (
        jnp.sum(jnp.square(q), axis=-1) if metric == "l2" else None
    )
    parts_s, parts_i = [], []
    for p0 in range(0, nprobe, max_probe):
        sel_part = sel[:, p0 : p0 + max_probe]
        s_part, i_part = gp.beam_expand(
            sel_part, q, pv, pi, sc, CAPACITY, interpret=interpret
        )
        if metric == "l2":
            # internal convention (ops/distance.py): negated squared
            # distance = 2qd - |d|^2 - |q|^2
            s_part = (
                2.0 * s_part - row_sq[sel_part] - q_sq[:, None, None]
            )
        parts_s.append(s_part)
        parts_i.append(i_part)
    cand_s = jnp.concatenate(parts_s, axis=1).reshape(q.shape[0], -1)
    cand_i = jnp.concatenate(parts_i, axis=1).reshape(q.shape[0], -1)
    cand_s = jnp.where(cand_i >= 0, cand_s, -jnp.inf)
    vals, pos = jax.lax.top_k(cand_s, min(shortlist, cand_s.shape[1]))
    ids = jnp.take_along_axis(cand_i, pos, axis=1)
    if rescore:
        # chunk the row-gather rescore over query sub-blocks exactly like
        # the union path: the unchunked [qb, shortlist, d] dequant
        # transient is ~8 GB at qb=4096/k=100/d=1024 (shortlist=4k) and
        # OOMs one v5e chip alongside a 2^22-row slab table
        s_actual = ids.shape[1]
        if rescore == "slab":
            vals = _map_rescore(
                lambda qq, ii: _slab_rescore_rows(
                    pv, sc, row_sq, slot, qq, ii, metric
                ),
                q, ids, s_actual * pv.shape[1] * 5,
            )
        else:
            vals = _map_rescore(
                lambda qq, ii: _exact_rescore_rows(db, qq, ii, metric),
                q, ids, s_actual * db.shape[1] * 4,
            )
        vals, order = jax.lax.top_k(vals, min(k_eff, vals.shape[1]))
        ids = jnp.take_along_axis(ids, order, axis=1)
    return vals, ids


_dma_block_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k_eff", "nprobe", "shortlist", "rescore", "max_probe",
        "route_approx", "interpret",
    ),
)(_dma_block_one)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k_eff", "nprobe", "shortlist", "rescore", "max_probe",
        "route_approx", "interpret",
    ),
)
def _dma_scan_stacked(
    q_blocks, centroids, pv, pi, sc, row_sq, db, slot, *,
    metric, k_eff, nprobe, shortlist, rescore, max_probe, route_approx,
    interpret,
):
    """All DMA-path query blocks in ONE device call (lax.scan): the eager
    per-block loop paid ~8 relay dispatches per 4096-query block — the
    measured reason the per-probe path ran ~15× below its own
    bytes-per-query roofline at n=2^22 (route + expand pieces account for
    ~1/15th of the end-to-end time; scripts/profile_ivf_dma.py)."""

    def body(_, q):
        return None, _dma_block_one(
            q, centroids, pv, pi, sc, row_sq, db, slot,
            metric=metric, k_eff=k_eff, nprobe=nprobe,
            shortlist=shortlist, rescore=rescore, max_probe=max_probe,
            route_approx=route_approx, interpret=interpret,
        )

    _, (vals, ids) = jax.lax.scan(body, None, q_blocks)
    return vals, ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k_eff", "nprobe", "shortlist", "rescore", "budget",
        "int8_min_rows", "compute", "route_approx",
    ),
)
def _union_scan_stacked(
    q_blocks, sel_blocks, centroids, pv, pi, sc, row_sq, db, slot, *,
    metric, k_eff, nprobe, shortlist, rescore, budget, int8_min_rows,
    compute="sym", route_approx=False,
):
    """All same-budget query blocks in ONE device call: a lax.scan over
    [G, qb, d] stacked blocks, each through _union_scan_one. The per-block
    Python loop it replaces paid ~10 relay dispatches per block (route,
    gather, scan, rescore, ... each a separate device call); a 131k-query
    search now issues one dispatch per DISTINCT gather budget (a handful
    of powers of two) — the fix for the measured call-overhead-bound
    12-21k q/s plateau at 4096-query blocks (scripts/bench_ivf.py).

    `sel_blocks` [G, qb, nprobe] carries the budget-sizing pass's probe
    selections so the scan does not route a second time (None → route
    in-scan, the traced/static-budget path)."""

    def body(_, xs):
        q, sel = xs if sel_blocks is not None else (xs, None)
        return None, _union_scan_one(
            q, centroids, pv, pi, sc, row_sq, db, slot,
            metric=metric, k_eff=k_eff, nprobe=nprobe, shortlist=shortlist,
            rescore=rescore, budget=budget, int8_min_rows=int8_min_rows,
            compute=compute, route_approx=route_approx, sel=sel,
        )

    xs = q_blocks if sel_blocks is None else (q_blocks, sel_blocks)
    _, (vals, ids) = jax.lax.scan(body, None, xs)
    return vals, ids


class IVFIndex:
    """Inverted-file ANN over device-resident int8 slabs.

    Two execution paths share one index layout:

    * slab-DMA (`ops/graph_pallas.beam_expand`): per-query probed slabs
      stream through the double-buffered DMA kernel — latency-optimised,
      for small/online batches and traced callers.
    * union-scan (batched, host path): the UNION of cells probed by a
      query block is gathered once into a contiguous dequantised buffer
      and scanned by the flat packed segment-top-R engine
      (`ops/exact_pallas.py`) — each 128 KB slab is fetched once per
      BLOCK instead of once per (query, probe), and scoring runs at the
      flat engine's MXU rate. Work scales with the probed fraction of
      the database (sub-linear for query sets with routing locality) and
      degrades gracefully into the flat full scan when a block probes
      everything. Queries also see every unioned cell, not just their
      own nprobe — a strict recall superset of classical IVF.
    """

    # fp32 rescore of the final top-k (row gathers: cheap for small k,
    # a full-db-sized gather at k=1000 * 131k queries — quantised scores
    # rank fine there)
    RESCORE_MAX_K = 128
    QUERY_BLOCK = 4096
    # union-scan rows at/above which the gather-free indirect sq8-sym
    # kernel runs (ops/ivf_pallas.py). 0 = always for ip/cosine: with no
    # union gather there is no small-union overhead regime left (the old
    # 1<<17 threshold balanced the int8 GATHER path against bf16; tests
    # still force the bf16 gather path with 10**9)
    INT8_UNION_MIN_ROWS = 0
    # the DMA expand kernel double-buffers e slabs of [128, d] int8 in
    # VMEM; cap e per call and loop (2 * e * 128 * d bytes <= ~8 MB)
    MAX_PROBE_PER_CALL = 32
    # blocks at least this big take the union-scan path (below it the
    # union is sparse and the per-probe DMA kernel wins)
    UNION_MIN_Q = 512
    # approximate routing/cell selection (jax.lax.approx_max_k, the TPU
    # PartialReduce op) — 2-3× cheaper than exact top_k on the routing
    # pass; None = auto (on for the TPU backend, off elsewhere so CPU
    # parity tests and sharded goldens stay exact)
    ROUTE_APPROX = None
    # budget/nprobe ratio above which the per-probe DMA path beats the
    # union scan even for BIG batches: the union scan's compute per query
    # is budget·128·d bf16 MACs (MXU, ~197 TF/s) while the DMA path's
    # cost per query is nprobe·128·d gathered bytes (~819 GB/s HBM), so
    # DMA wins when nprobe·128·d/819e9 < 2·budget·128·d/197e12, i.e.
    # budget ≳ 120·nprobe. Measured at n=2^20/d=1024/nprobe=16 with
    # block unions ≈ half the cell table: DMA 58.6k q/s vs union 24.2k.
    # Low-locality query sets (block unions near the whole table) cross
    # it; family-sorted production streams stay on the union scan.
    DMA_OVER_UNION_RATIO = 96

    def __init__(
        self,
        metric: str = "cosine",
        n_clusters: int = 0,  # 0 -> auto: ~2 * n / capacity (half-full)
        nprobe: int = 16,
        kmeans_iters: int = 8,
        prefs: int = 4,  # ranked cluster choices for capacity balancing
        store_fp32: bool = True,
        rescore_max_k: Optional[int] = None,
        shortlist_mult: float = 4.0,
        config: Optional[SearchConfig] = None,
    ):
        self.metric = metric
        self.n_clusters = n_clusters
        self.nprobe = nprobe
        self.kmeans_iters = kmeans_iters
        self.prefs = prefs
        # rescore_max_k lifts the fp32-rescore cutoff above the class
        # default (RESCORE_MAX_K): at k=1000 the rescore gather is
        # ~shortlist·4 KB per query, so it costs real bandwidth — but on
        # tie-dense corpora it is what closes recall@1000 from the int8
        # scan's ~0.95 ceiling to ≥0.99 (the FAISS-HNSW efSearch=256
        # class). shortlist_mult sizes the rescore pool (default 4×k,
        # capped by the candidate pool).
        self.rescore_max_k = rescore_max_k
        self.shortlist_mult = shortlist_mult
        # store_fp32=False is the memory-lean mode: the fp32 rows are
        # dropped right after build, so the device footprint is ONLY the
        # int8 cluster slabs + scales/ids + centroids (~n*(d+12) bytes —
        # less than HALF of FAISS HNSW's fp32 vectors + links). Small-k
        # near-tie ordering is preserved by re-scoring the shortlist in
        # fp32 against the DEQUANTISED slabs (_slab_rescore_rows): only
        # the ~0.07% storage quantisation error remains caller-visible,
        # not the scan's ~0.4% bf16/int8 compute noise. The remaining
        # cost: no incremental add() after build (the source rows are
        # gone). ShardedIVFIndex(rescore=False) is the sharded analog.
        self.store_fp32 = store_fp32
        self.config = config or SearchConfig(metric=metric)
        self._db: Optional[jnp.ndarray] = None
        self._n = 0
        self._d = 0
        self._centroids: Optional[jnp.ndarray] = None
        self._members: Optional[np.ndarray] = None
        self._packed = None  # (vecs int8 [C*128, d], ids [C,128], scales)
        self._slot = None  # [n] int32: global id -> packed row (lazy)
        self._row_sq: Optional[jnp.ndarray] = None  # l2 additive term

    @property
    def ntotal(self) -> int:
        return self._n

    def add(self, vectors) -> "IVFIndex":
        if self._n and self._db is None:
            raise ValueError(
                "store_fp32=False dropped the fp32 rows at build; a lean"
                " index cannot add() incrementally — rebuild from the"
                " source vectors"
            )
        v = jnp.asarray(vectors, dtype=jnp.float32)
        if self.metric == "cosine":
            v = l2_normalize(v)
        if self._db is not None:
            v = jnp.concatenate([self._db, v], axis=0)
        self._db = jax.device_put(v)
        self._n, self._d = int(v.shape[0]), int(v.shape[1])
        self._build()
        if not self.store_fp32:
            self._db = None
        return self

    def _auto_clusters(self, n: int) -> int:
        if self.n_clusters > 0:
            return min(self.n_clusters, n)
        return max(1, int(np.ceil(2 * n / CAPACITY)))

    def add_chunks(
        self,
        make_chunks,
        n_total: int,
        kmeans_sample: int = 1 << 19,
    ) -> "IVFIndex":
        """Streamed lean build: index a corpus whose fp32 rows never fit
        HBM at once (n=2^22 x d=1024 fp32 is 16 GB — the whole chip). The
        per-chunk footprint is one fp32 chunk + the growing int8 copy
        (~n*(d+5) bytes), so one v5e chip holds a 4M-row d=1024 lean index
        where the UniRef90 rehearsal previously needed 16 spilled shards
        (the reference regime: more_sensitive/uniref90-figures/, built on
        a large-RAM CPU host).

        `make_chunks` is a ZERO-ARG callable returning a fresh iterable of
        [rows, d] arrays (numpy memmap chunks, a device generator, ...) —
        it is invoked TWICE: pass 1 strides a <= `kmeans_sample`-row
        subsample for k-means (stride n_total/kmeans_sample — uniform, so
        the sample sees every region of a sorted corpus), pass 2 routes +
        int8-quantises each chunk into preallocated device buffers
        (donated in-place updates; keep chunk sizes uniform to bound
        compile variety). Requires store_fp32=False — the fp32 rows are
        exactly what cannot exist.
        """
        if self._n:
            raise ValueError(
                "add_chunks builds from scratch; the index already has"
                f" {self._n} rows"
            )
        if self.store_fp32:
            raise ValueError(
                "add_chunks is the lean streamed build — construct the"
                " index with store_fp32=False (the fp32 rows are exactly"
                " what cannot be resident)"
            )
        n = int(n_total)
        c = self._auto_clusters(n)
        p = min(self.prefs, c)
        d = None
        # ---- pass 1: strided k-means subsample ----
        stride = max(1, -(-n // int(kmeans_sample)))
        parts = []
        seen = 0
        for chunk in make_chunks():
            v = jnp.asarray(chunk, dtype=jnp.float32)
            if self.metric == "cosine":
                v = l2_normalize(v)
            d = int(v.shape[1])
            first = (-seen) % stride
            parts.append(v[first::stride])
            seen += int(v.shape[0])
        if seen != n:
            raise ValueError(
                f"make_chunks() yielded {seen} rows, n_total says {n}"
            )
        sample = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        del parts
        self._centroids = _kmeans(
            sample, c, self.kmeans_iters, self.metric
        )
        del sample
        # ---- pass 2: route + quantise chunk by chunk ----
        db_i8 = jnp.zeros((n, d), jnp.int8)
        scales = jnp.ones((n,), jnp.float32)
        order2 = jnp.zeros((n, p), jnp.int32)
        sq = jnp.zeros((n,), jnp.float32) if self.metric == "l2" else None
        start = 0
        for chunk in make_chunks():
            v = jnp.asarray(chunk, dtype=jnp.float32)
            if self.metric == "cosine":
                v = l2_normalize(v)
            q8, s = gp.quantize_int8(v)
            prefs = _route_prefs(v, self._centroids, self.metric, p)
            at = jnp.asarray(start, jnp.int32)
            db_i8 = _chunk_write(db_i8, q8, at)
            scales = _chunk_write(scales, s, at)
            order2 = _chunk_write(order2, prefs.astype(jnp.int32), at)
            if sq is not None:
                sq = _chunk_write(
                    sq, jnp.sum(jnp.square(v), axis=-1), at
                )
            start += int(v.shape[0])
        self._n, self._d = n, d
        members = _balanced_members(order2, c, CAPACITY)
        del order2
        self._members = members
        # int8 slab gather: peak HBM here is the int8 source + the packed
        # slabs (~n*(1 + c*CAPACITY/n) KB at d=1024) — the build's high-water
        # mark, a quarter of what an fp32-source gather would hold
        pv, pi, sc = gp.pack_neighbours_prequant(
            db_i8, scales, members, CAPACITY
        )
        self._packed = (pv, pi, sc)
        self._slot = None
        if sq is not None:
            safe = jnp.clip(members, 0, n - 1)
            self._row_sq = jnp.where(members >= 0, sq[safe], 0.0)
        self._db = None
        return self

    def _build(self) -> None:
        n, d = self._db.shape
        c = self._auto_clusters(n)
        self._centroids = _kmeans(
            self._db, c, self.kmeans_iters, self.metric
        )
        # ranked preferences for balancing (top-P nearest centroids),
        # computed block-wise: the one-shot [N, C] matrix OOMs above ~1M
        # rows (see _route_prefs_blocked)
        p = min(self.prefs, c)
        order2 = _route_prefs(self._db, self._centroids, self.metric, p)
        # device-resident end to end: fetching order2 to the host cost a
        # 30-600 s relay round-trip (the old dominant build cost)
        self._members = _balanced_members(order2, c, CAPACITY)
        pv, pi, sc = gp.pack_neighbours(
            self._db, jnp.asarray(self._members), CAPACITY
        )
        self._packed = (pv, pi, sc)
        self._slot = None  # stale after a re-pack (incremental add)
        if self.metric == "l2":
            sq = jnp.sum(jnp.square(self._db), axis=-1)
            safe = jnp.clip(jnp.asarray(self._members), 0, n - 1)
            self._row_sq = jnp.where(
                jnp.asarray(self._members) >= 0, sq[safe], 0.0
            )

    def search(
        self, queries, k: int, union_budget: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        sims, ids = self.search_device(queries, k, union_budget)
        return np.asarray(sims), np.asarray(ids)

    def search_device(
        self, queries, k: int, union_budget: Optional[int] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-resident variant (no host readout — benchmarks and
        device-side pipelines; `search` is the numpy-facing wrapper).

        `union_budget` fixes the union-scan gather at a STATIC cell count
        instead of sizing it from the measured block unions (which needs
        a host sync): the whole search — locality sort included — then
        traces under jit/shard_map. Blocks whose true union exceeds the
        budget drop their least-popular cells (see _union_scan_one);
        recall decays gracefully and monotonically in the budget."""
        if self._n == 0:
            raise ValueError("index is empty; call add() first")
        if union_budget is not None and union_budget <= 0:
            union_budget = None  # 0/negative = "size from the blocks"
        q_all = jnp.asarray(queries, dtype=jnp.float32)
        if self.metric == "cosine":
            q_all = l2_normalize(q_all)
        n = self.ntotal
        c = self._centroids.shape[0]
        k_eff, nprobe, rescore, shortlist, qb, compute = self.plan_blocks(k)
        interpret = jax.default_backend() != "tpu"
        pv, pi, sc = self._packed
        traced = isinstance(q_all, jax.core.Tracer)
        # route-locality sort (host callers, and traced callers that set
        # a static union_budget — argsort/gather trace fine; only the
        # budget host sync doesn't): queries grouped by their top-1 cell
        # give each union-scan block a smaller cell union and the DMA
        # path better slab reuse. Measured effect is noise-bound
        # on the relay (best-of-3 runs put sorted and unsorted in the same
        # 12-21k q/s band; single-shot runs once showed 2.5x); kept
        # because the argsort is ~free and recall is unaffected — the
        # inverse permutation restores caller order.
        union_ok = not traced or union_budget is not None
        perm = None
        if (
            union_ok
            and q_all.shape[0] > qb
            and q_all.shape[0] >= self.UNION_MIN_Q
        ):
            # blocked top-1 routing: the one-shot [Q, C] matrix is 4.3 GB
            # at 65k queries x 16k cells (OOMed next to the 1M-row index)
            top1 = _route_prefs(q_all, self._centroids, self.metric, 1)
            perm = jnp.argsort(top1[:, 0])
            q_all = q_all[perm]
        if union_ok and q_all.shape[0] >= self.UNION_MIN_Q:
            # ONE host sync sizes every block's gather (vs a scalar fetch
            # per block — tens of ms each through the relay). The tail
            # block is padded by repeating the last row: extra cells only
            # over-estimate its union (a power-of-2 round-up anyway).
            q_n0 = q_all.shape[0]
            n_blocks = -(-q_n0 // qb)
            pad = n_blocks * qb - q_n0
            q_pad = (
                jnp.concatenate(
                    [q_all, jnp.broadcast_to(q_all[-1:], (pad, q_all.shape[1]))]
                )
                if pad
                else q_all
            )
            q_blocks = q_pad.reshape(n_blocks, qb, -1)
            sel_blocks = None
            if union_budget is not None:
                budgets = [min(int(union_budget), c)] * n_blocks
            else:
                u_dev, sel_blocks = _block_union_counts(
                    q_blocks, self._centroids, self.metric, nprobe,
                    route_approx=self._route_approx(),
                )
                u_vec = np.asarray(u_dev)
                budgets = [
                    min(1 << max(int(u) - 1, 0).bit_length(), c)
                    for u in u_vec
                ]
            # low-locality escape hatch: when the measured block unions
            # are huge relative to nprobe, every query would pay MXU
            # compute over a union it barely probes — the per-probe DMA
            # loop below is cheaper (see DMA_OVER_UNION_RATIO). Explicit
            # union_budget callers (traced/sharded) stay on the union
            # scan: their budget choice already encodes the trade.
            if union_budget is None and float(
                np.median(budgets)
            ) >= self.DMA_OVER_UNION_RATIO * nprobe:
                budgets = None
        else:
            budgets = None
        if budgets is not None:
            # group blocks by gather budget: ONE device dispatch per
            # distinct power-of-two budget (lax.scan over the stacked
            # blocks) instead of ~10 dispatches per block — the per-call
            # relay overhead was the measured 12-21k q/s plateau.
            groups: dict = {}
            for bi, b in enumerate(budgets):
                groups.setdefault(b, []).append(bi)
            pv, pi, sc = self._packed
            row_sq = self._row_sq_arg()
            out_v: list = [None] * n_blocks
            out_i: list = [None] * n_blocks
            for b, idxs in sorted(groups.items()):
                # dispatch the group in power-of-two-sized chunks (largest
                # first): the traced shape space stays {2^m blocks} ×
                # {pow2 budgets} regardless of how unions happened to
                # distribute, so a fresh group size never costs a fresh
                # relay compile — a few extra ~ms dispatches beat minutes
                # of compile
                start = 0
                while start < len(idxs):
                    g = 1 << (len(idxs) - start).bit_length() - 1
                    chunk = idxs[start : start + g]
                    whole = len(chunk) == n_blocks
                    take = (
                        None if whole
                        else jnp.asarray(chunk, dtype=jnp.int32)
                    )
                    stack = q_blocks if whole else q_blocks[take]
                    sel_stack = (
                        None if sel_blocks is None
                        else sel_blocks if whole
                        else sel_blocks[take]
                    )
                    vals, ids = _union_scan_stacked(
                        stack, sel_stack, self._centroids, pv, pi, sc,
                        row_sq, self._db_arg(), self._slot_arg(),
                        metric=self.metric, k_eff=k_eff,
                        nprobe=nprobe, shortlist=shortlist,
                        rescore=rescore, budget=b,
                        int8_min_rows=self.INT8_UNION_MIN_ROWS,
                        compute=compute,
                        route_approx=self._route_approx(),
                    )
                    for j, bi in enumerate(chunk):
                        out_v[bi] = vals[j]
                        out_i[bi] = ids[j]
                    start += g
            sims = jnp.concatenate(out_v, axis=0)[:q_n0]
            ids = jnp.concatenate(out_i, axis=0)[:q_n0]
            return self._finalize_search(sims, ids, k, perm)
        dma_kwargs = dict(
            metric=self.metric, k_eff=k_eff, nprobe=nprobe,
            shortlist=shortlist, rescore=rescore,
            max_probe=self.MAX_PROBE_PER_CALL,
            route_approx=self._route_approx(), interpret=interpret,
        )
        dma_args = (
            self._centroids, pv, pi, sc, self._row_sq_arg(),
            self._db_arg(), self._slot_arg(),
        )
        q_n0 = q_all.shape[0]
        if q_n0 <= qb:
            sims, ids = _dma_block_jit(q_all, *dma_args, **dma_kwargs)
            return self._finalize_search(sims, ids, k, perm)
        # stack full blocks into ONE scan dispatch (tail padded by
        # repeating the last row, cropped after)
        n_blocks = -(-q_n0 // qb)
        pad = n_blocks * qb - q_n0
        q_pad = (
            jnp.concatenate(
                [q_all, jnp.broadcast_to(q_all[-1:], (pad, q_all.shape[1]))]
            )
            if pad
            else q_all
        )
        sims, ids = _dma_scan_stacked(
            q_pad.reshape(n_blocks, qb, -1), *dma_args, **dma_kwargs
        )
        sims = sims.reshape(n_blocks * qb, -1)[:q_n0]
        ids = ids.reshape(n_blocks * qb, -1)[:q_n0]
        return self._finalize_search(sims, ids, k, perm)

    def _finalize_search(self, sims, ids, k: int, perm):
        """Common search epilogue: undo the route-locality sort, pad the
        column axis to k with the FAISS sentinel, finalize scores."""
        if perm is not None:
            inv = jnp.argsort(perm)
            sims = sims[inv]
            ids = ids[inv]
        if sims.shape[1] < k:
            pad = k - sims.shape[1]
            sims = jnp.pad(
                sims, ((0, 0), (0, pad)), constant_values=-jnp.inf
            )
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return finalize_scores(sims, self.metric), ids

    def _union_scan_block(
        self, q, k_eff, nprobe, shortlist, rescore, budget=None,
        compute="sym",
    ):
        """Batched search over the union of the block's probed cells (see
        class docstring). The power-of-two cell `budget` sizing the gather
        normally arrives precomputed (one batched host sync for all
        blocks, _block_union_counts); a direct caller may omit it and pay
        a per-block scalar fetch."""
        c = self._centroids.shape[0]
        pv, pi, sc = self._packed
        sel = None
        if budget is None:
            route = _route_sims(q, self._centroids, self.metric)
            sel = _route_topk(route, nprobe, self._route_approx())
            probed = (
                jnp.zeros((c,), jnp.int32).at[sel.reshape(-1)].set(1)
            )
            u = int(jnp.sum(probed))  # one scalar fetch per block
            budget = min(1 << max(u - 1, 0).bit_length(), c)
        return _union_scan_one(
            q, self._centroids, pv, pi, sc, self._row_sq_arg(),
            self._db_arg(), self._slot_arg(), metric=self.metric,
            k_eff=k_eff, nprobe=nprobe,
            shortlist=shortlist, rescore=rescore, budget=budget,
            int8_min_rows=self.INT8_UNION_MIN_ROWS, compute=compute,
            route_approx=self._route_approx(), sel=sel,
        )

    def plan_blocks(self, k: int):
        """Shared search sizing:
        (k_eff, nprobe, rescore, shortlist, qb, compute).
        `qb` is the EFFECTIVE query block (benches should report this,
        not QUERY_BLOCK); rescore transients are chunk-bounded
        independently of qb (_map_rescore), so qb stays QUERY_BLOCK.

        * nprobe: the candidate pool must cover k with headroom (2x:
          capacity padding and imperfect routing eat into the nominal
          nprobe*128 slots).
        * shortlist: fp32 rescore wider than k — int8 kernel scores carry
          ~0.4%-of-row-norm noise, so near-ties (e.g. a tight cluster's
          members) need the exact pass to pick the true top-k; a whole
          cluster's worth of headroom covers the worst near-tie case."""
        n = self.ntotal
        c = self._centroids.shape[0]
        k_eff = min(k, n)
        # candidate-pool floor: cells hold avg n/c rows (64 at the auto
        # half-full sizing), NOT the capacity — flooring by CAPACITY
        # undersized the k=1000 pool 2× (nprobe·128 slots but only
        # nprobe·64 real candidates)
        avg_fill = max(1, n // max(c, 1))
        nprobe = min(max(self.nprobe, -(-2 * k_eff // avg_fill)), c)
        # lean mode (store_fp32=False) rescores from the dequantised
        # slabs instead of the (dropped) fp32 rows
        rescore = False
        max_rescore_k = (
            self.rescore_max_k
            if self.rescore_max_k is not None
            else self.RESCORE_MAX_K
        )
        if k_eff <= max_rescore_k:
            rescore = "db" if self._db is not None else "slab"
        # Without a TRUE-fp32 rescore pass ("db"), lift the query-side
        # quantisation noise IN the scan instead: the sym2 residual int8
        # pass reaches the same storage-noise floor the dequantised-slab
        # fp32 rescore does, without a per-candidate row gather — the r4
        # high-recall wall was exactly that gather at k=1000 (no-rescore
        # recall ceilinged ~0.94 on query noise,
        # benchmarks/r4_campaigns.md). One extra int8 MXU pass on a path
        # far from compute-bound.
        compute = "sym" if rescore == "db" else "sym2"
        shortlist = (
            min(
                max(int(self.shortlist_mult * k_eff), CAPACITY),
                nprobe * CAPACITY,
            )
            if rescore
            else k_eff
        )
        # qb is NOT halved for the rescore transient any more: both
        # row-gather rescores chunk internally (_map_rescore) and the
        # union-matmul rescore's buffer is qb-independent, so large
        # blocks only amortise the rescore pass's fixed per-block costs.
        # The r3 halving forced qb=256 at shortlist=1500/d=1024 — the
        # measured wall behind the 5.5k q/s high-recall plateau
        # (scripts/profile_ivf_union.py).
        qb = self.QUERY_BLOCK
        return k_eff, nprobe, rescore, shortlist, qb, compute

    def _route_approx(self) -> bool:
        if self.ROUTE_APPROX is not None:
            return bool(self.ROUTE_APPROX)
        return jax.default_backend() == "tpu"

    def _row_sq_arg(self) -> jnp.ndarray:
        """The l2 additive term for the union-scan buffer; a [0, CAPACITY]
        placeholder for other metrics (shape-stable jit argument)."""
        if self.metric == "l2":
            return self._row_sq
        return jnp.zeros((0, CAPACITY), jnp.float32)

    def _db_arg(self) -> jnp.ndarray:
        """fp32 rows for the rescore pass; a [0, d] placeholder when the
        lean mode dropped them (rescore mode is then "slab" — the union
        scan only reads `db.shape[1]`)."""
        if self._db is not None:
            return self._db
        return jnp.zeros((0, self._d), jnp.float32)

    def _slot_arg(self) -> jnp.ndarray:
        """[n] int32 global id -> packed slab row, for the lean slab
        rescore ([0] placeholder when fp32 rows exist). Built lazily by
        inverting the packed id table (each row lives in exactly ONE
        capacity-balanced cell; padding slots scatter into a discarded
        overflow entry)."""
        if self._db is not None:
            return jnp.zeros((0,), jnp.int32)
        if self._slot is None:
            flat = self._packed[1].reshape(-1)
            idx = jnp.where(flat >= 0, flat, self._n)
            self._slot = (
                jnp.zeros((self._n + 1,), jnp.int32)
                .at[idx]
                .set(jnp.arange(flat.shape[0], dtype=jnp.int32))[: self._n]
            )
        return self._slot

    def _exact_rescore(self, q, ids):
        if self._db is not None:
            return _exact_rescore_rows(self._db, q, ids, self.metric)
        pv, _, sc = self._packed
        return _slab_rescore_rows(
            pv, sc, self._row_sq_arg(), self._slot_arg(), q, ids,
            self.metric,
        )

    # --- persistence payload (see search/io.py) ---
    def state(self) -> dict:
        base = {
            "kind": "ivf",
            "metric": self.metric,
            "n_clusters": self._centroids.shape[0],
            "nprobe": self.nprobe,
            "kmeans_iters": self.kmeans_iters,
            "prefs": self.prefs,
            "centroids": np.asarray(self._centroids),
            "members": np.asarray(self._members),
        }
        if self._db is not None:
            base["vectors"] = np.asarray(self._db)
            return base
        # lean layout: the int8 slabs ARE the index — persist them
        # directly so the round-trip is bit-identical (re-quantising a
        # dequantised reconstruction would not be)
        pv, pi, sc = self._packed
        base.update(
            lean=1,
            n=self._n,
            d=self._d,
            packed_vecs=np.asarray(pv),
            packed_ids=np.asarray(pi),
            packed_scales=np.asarray(sc),
        )
        if self._row_sq is not None:
            base["row_sq"] = np.asarray(self._row_sq)
        return base

    @classmethod
    def from_state(cls, state: dict) -> "IVFIndex":
        lean = "lean" in state and bool(np.asarray(state["lean"]))
        index = cls(
            metric=str(state["metric"]),
            n_clusters=int(state["n_clusters"]),
            nprobe=int(state["nprobe"]),
            kmeans_iters=int(state["kmeans_iters"]),
            prefs=int(state["prefs"]),
            store_fp32=not lean,
        )
        index._centroids = jnp.asarray(state["centroids"])
        index._members = np.asarray(state["members"])
        if lean:
            index._n = int(state["n"])
            index._d = int(state["d"])
            index._packed = (
                jnp.asarray(state["packed_vecs"]),
                jnp.asarray(state["packed_ids"]),
                jnp.asarray(state["packed_scales"]),
            )
            if "row_sq" in state:
                index._row_sq = jnp.asarray(state["row_sq"])
            return index
        index._db = jnp.asarray(state["vectors"])
        index._n, index._d = (int(s) for s in index._db.shape)
        pv, pi, sc = gp.pack_neighbours(
            index._db, jnp.asarray(index._members), CAPACITY
        )
        index._packed = (pv, pi, sc)
        if index.metric == "l2":
            sq = jnp.sum(jnp.square(index._db), axis=-1)
            safe = jnp.clip(
                jnp.asarray(index._members), 0, index.ntotal - 1
            )
            index._row_sq = jnp.where(
                jnp.asarray(index._members) >= 0, sq[safe], 0.0
            )
        return index
