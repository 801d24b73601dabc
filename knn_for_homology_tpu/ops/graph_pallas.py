"""Fused graph-ANN beam expansion: scalar-prefetch adjacency gather + score.

The beam search's hot op is "fetch the expanded nodes' neighbour vectors and
score them against the query". XLA lowers that row gather to a serial
dynamic-slice loop: measured 43 ms per [1024 queries × 336 candidates × 1024d]
iteration on v5e — 16 GB/s against an ~800 GB/s part, and int8 data doesn't
help (the cost is per gathered row, not per byte). Packing each node's
neighbour vectors contiguously and gathering slabs through XLA is no better
(58 ms): XLA gather is loop-lowered regardless of slab size.

This kernel makes the gather a *pipelined DMA*: the expanded node ids are a
scalar-prefetch operand, so each grid step's BlockSpec index_map picks the
[DEG_P, d] slab of a pre-packed neighbour-vector matrix straight from HBM
while the previous step computes — the idiomatic Pallas-TPU embedding-gather
pattern (pallas guide §PrefetchScalarGridSpec). Per step it also copies the
node's adjacency ids, so beam search needs NO XLA gathers at all.

Packed layout, built once at index-build time:
  * packed_vecs [N * DEG_P, d] int8 — node n's padded neighbour vectors at
    rows [n*DEG_P, (n+1)*DEG_P); symmetric per-ROW quantisation (the final
    top-k is exactly rescored in fp32 regardless).
  * packed_ids [N, 128] int32 — adjacency padded with -1 to the f32 lane
    tile (DEG_P ≤ 128).
  * packed_scales [N, 128] f32 — per-neighbour dequant scales aligned with
    packed_ids (1.0 on padding).

DEG_P pads the degree to a multiple of 32 (int8 sublane tile).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def pad_degree(degree: int) -> int:
    """int8 slabs want a sublane multiple of 32."""
    return max(32, ((degree + 31) // 32) * 32)


def quantize_int8(db: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-ROW int8 quantisation: dequant row n ≈ q[n] * scale[n].
    Per-row scales keep the similarity error at ~0.4% of each row's norm —
    a global scale cost recall@10 0.984→0.941 on the n=131k benchmark."""
    max_abs = jnp.maximum(
        jnp.max(jnp.abs(db), axis=1, keepdims=True), 1e-30
    )
    scale = max_abs / 127.0
    q = jnp.clip(jnp.round(db / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("deg_p",), donate_argnums=())
def pack_neighbours(
    db: jnp.ndarray,  # [N, d] fp32
    graph: jnp.ndarray,  # [N, degree] int32
    deg_p: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build (packed_vecs [G*deg_p, d] int8, packed_ids [G, 128] int32,
    packed_scales [G, 128] f32). Padding ids are -1; their vector rows are
    zeros and their scales 1.0.

    `graph` has one row per slab GROUP — the db adjacency for the graph
    engine (G == N), or any other db-row grouping (the IVF engine passes
    cluster membership lists, G == n_clusters, search/ivf.py)."""
    q8, scales = quantize_int8(db)
    return pack_neighbours_prequant(q8, scales, graph, deg_p)


@functools.partial(jax.jit, static_argnames=("deg_p",), donate_argnums=())
def pack_neighbours_prequant(
    q8: jnp.ndarray,  # [N, d] int8 (already per-row quantised)
    scales: jnp.ndarray,  # [N] f32 dequant scales
    graph: jnp.ndarray,  # [G, degree] int32
    deg_p: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """pack_neighbours from an already-quantised source: the streamed lean
    IVF build (search/ivf.py add_chunks) quantises chunk by chunk because
    the fp32 rows never fit HBM all at once; the slab gather then reads
    int8 — a quarter of the fp32 gather bytes."""
    n, d = q8.shape
    groups, degree = graph.shape
    if deg_p > LANE:
        raise ValueError(
            f"packed adjacency supports degree <= {LANE} (got {degree}: "
            f"ids/scales are one {LANE}-lane row per node) — use the XLA "
            "beam path (GraphIndex(packed='never'))"
        )
    pad_ids = jnp.full((groups, deg_p - degree), -1, jnp.int32)
    ids_p = jnp.concatenate([graph.astype(jnp.int32), pad_ids], axis=1)
    safe = jnp.clip(ids_p, 0, n - 1)
    vecs = q8[safe.reshape(-1)]  # [G*deg_p, d] int8 (one-time XLA gather)
    vecs = jnp.where((ids_p.reshape(-1) >= 0)[:, None], vecs, 0)
    if d % LANE:
        # Mosaic slab slices must be 128-lane aligned; zero int8 columns
        # are dot-product-neutral (beam_expand pads queries to match)
        vecs = jnp.pad(vecs, ((0, 0), (0, -d % LANE)))
    # per-neighbour dequant scales, padded with 1.0 (pad score lanes are
    # -inf; 0.0 would turn them into NaN in the kernel's multiply)
    sc = jnp.where(ids_p >= 0, scales[safe], 1.0)
    if deg_p < LANE:
        ids_out = jnp.concatenate(
            [ids_p, jnp.full((groups, LANE - deg_p), -1, jnp.int32)], axis=1
        )
        sc_out = jnp.concatenate(
            [sc, jnp.ones((groups, LANE - deg_p), jnp.float32)], axis=1
        )
    else:
        ids_out = ids_p[:, :LANE]
        sc_out = sc[:, :LANE]
    return vecs, ids_out, sc_out


def _score_epilogue(slab, qv, scale, adj, sims_ref, nbr_ref, *, e, deg_p):
    """Shared scoring tail of BOTH expansion kernels (auto-pipelined and
    manual-DMA): dequant-dot the [e*deg_p, d] int8 slab against the query,
    pad lanes >= deg_p with -inf, apply per-neighbour scales, emit
    [1, e, 128] sims + adjacency. Keeping this shared means the
    production DMA kernel and the CI-testable interpret kernel cannot
    drift in their scoring math (only their data movement differs)."""
    s = jax.lax.dot_general(
        slab.astype(jnp.float32), qv.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(1, e, deg_p)
    if deg_p < LANE:
        s = jnp.pad(s, ((0, 0), (0, 0), (0, LANE - deg_p)),
                    constant_values=-jnp.inf)
    sims_ref[...] = s * scale
    nbr_ref[...] = adj


def _expand_kernel(ids_ref, q_ref, *refs, e, deg_p):
    """Grid (Q,). Score ALL e expanded nodes' padded neighbour slabs against
    the query in one step; emit [1, e, 128] (scores f32, ids int32).

    One grid step per (query, expansion) pair was 2 µs of per-step overhead
    × Q·E steps = 67 ms/iteration — no better than the XLA gather. Unrolling
    the e slabs as separate in_specs makes Mosaic issue all e DMAs per step
    and cuts the step count e-fold."""
    del ids_ref  # consumed by the index_maps
    slabs = refs[:e]
    adjs = refs[e : 2 * e]
    scs = refs[2 * e : 3 * e]
    sims_ref, nbr_ref = refs[3 * e], refs[3 * e + 1]
    slab = jnp.concatenate([s[...] for s in slabs], axis=0)  # [e*deg_p, d]
    scale = jnp.concatenate([sc[...] for sc in scs], axis=1)  # [1, e, LANE]
    adj = jnp.concatenate([a[...] for a in adjs], axis=1)
    _score_epilogue(
        slab, q_ref[0], scale, adj, sims_ref, nbr_ref, e=e, deg_p=deg_p
    )


def _expand_kernel_dma(
    ids_ref, q_ref, vec_hbm, adj_hbm, sc_hbm, sims_ref, nbr_ref,
    slab_buf, adj_buf, sc_buf, vsem, asem, ssem, *, e, deg_p, q_total,
):
    """Grid (Q,). Manual double-buffered DMA variant: start ALL e slab
    copies for step q+1 concurrently while computing step q — Mosaic's
    automatic pipeline issues block copies one at a time, leaving the ~3 µs
    per-DMA latency unhidden (measured 67-102 ms/iteration either way; the
    XLA gather it replaces pays the same wall at 36 GB/s)."""
    q = pl.program_id(0)

    def copies(slot, step):
        for j in range(e):
            node = ids_ref[step * e + j]
            yield pltpu.make_async_copy(
                vec_hbm.at[pl.ds(node * deg_p, deg_p), :],
                slab_buf.at[slot, pl.ds(j * deg_p, deg_p), :],
                vsem.at[slot, j],
            )
            yield pltpu.make_async_copy(
                adj_hbm.at[node],
                adj_buf.at[slot, j],
                asem.at[slot, j],
            )
            yield pltpu.make_async_copy(
                sc_hbm.at[node],
                sc_buf.at[slot, j],
                ssem.at[slot, j],
            )

    @pl.when(q == 0)
    def _first():
        for dma in copies(0, 0):
            dma.start()

    @pl.when(q + 1 < q_total)
    def _prefetch():
        for dma in copies((q + 1) % 2, q + 1):
            dma.start()

    slot = q % 2
    for dma in copies(slot, q):
        dma.wait()
    _score_epilogue(
        slab_buf[slot],  # [e*deg_p, d]
        q_ref[0],
        sc_buf[slot].reshape(1, e, LANE),
        adj_buf[slot].reshape(1, e, LANE),
        sims_ref,
        nbr_ref,
        e=e,
        deg_p=deg_p,
    )


def _beam_expand_dma(
    sel_ids, queries, packed_vecs, packed_ids, packed_scales, deg_p
):
    q_n, e = sel_ids.shape
    d = queries.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_n,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda q, ids: (q, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed_vecs stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed_ids stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed_scales (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, e, LANE), lambda q, ids: (q, 0, 0)),
            pl.BlockSpec((1, e, LANE), lambda q, ids: (q, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e * deg_p, d), jnp.int8),
            pltpu.VMEM((2, e, LANE), jnp.int32),
            pltpu.VMEM((2, e, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, e)),
            pltpu.SemaphoreType.DMA((2, e)),
            pltpu.SemaphoreType.DMA((2, e)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _expand_kernel_dma, e=e, deg_p=deg_p, q_total=q_n
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_n, e, LANE), jnp.float32),
            jax.ShapeDtypeStruct((q_n, e, LANE), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_n * e * deg_p * d,
            bytes_accessed=q_n * e * (deg_p * d + 2 * d + LANE * 8),
            transcendentals=0,
        ),
    )(
        sel_ids.reshape(-1),
        queries.reshape(q_n, 1, d),
        packed_vecs,
        packed_ids,
        packed_scales,
    )


@functools.partial(
    jax.jit, static_argnames=("deg_p", "interpret")
)
def beam_expand(
    sel_ids: jnp.ndarray,  # [Q, E] int32 expanded node ids (clipped >= 0)
    queries: jnp.ndarray,  # [Q, d] bf16/f32
    packed_vecs: jnp.ndarray,  # [N*deg_p, d] int8
    packed_ids: jnp.ndarray,  # [N, 128] int32
    packed_scales: jnp.ndarray,  # [N, 128] f32 per-neighbour dequant
    deg_p: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (sims [Q, E, 128] f32 dequantised, nbr_ids [Q, E, 128] int32).

    Lanes >= deg_p carry -inf / -1 padding; callers slice [:, :, :degree]."""
    q_n, e = sel_ids.shape
    if queries.shape[1] != packed_vecs.shape[1]:
        # slabs are lane-padded to a 128 multiple at pack time; zero query
        # columns keep every dot product unchanged
        queries = jnp.pad(
            queries, ((0, 0), (0, packed_vecs.shape[1] - queries.shape[1]))
        )
    d = queries.shape[1]

    if not interpret:
        # real TPU: manual double-buffered DMA (concurrent slab copies)
        return _beam_expand_dma(
            sel_ids, queries, packed_vecs, packed_ids, packed_scales, deg_p
        )

    def slab_spec(j):
        return pl.BlockSpec(
            (deg_p, d), lambda q, ids, j=j: (ids[q * e + j], 0)
        )

    def adj_spec(j):
        return pl.BlockSpec(
            (1, 1, LANE), lambda q, ids, j=j: (ids[q * e + j], 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_n,),
        in_specs=[
            # [Q, 1, d]: block trailing dims (1, d) == array's → allowed
            pl.BlockSpec((1, 1, d), lambda q, ids: (q, 0, 0)),
            *[slab_spec(j) for j in range(e)],
            *[adj_spec(j) for j in range(e)],
            *[adj_spec(j) for j in range(e)],  # scale rows share the layout
        ],
        out_specs=[
            pl.BlockSpec((1, e, LANE), lambda q, ids: (q, 0, 0)),
            pl.BlockSpec((1, e, LANE), lambda q, ids: (q, 0, 0)),
        ],
    )
    sims, nbrs = pl.pallas_call(
        functools.partial(_expand_kernel, e=e, deg_p=deg_p),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_n, e, LANE), jnp.float32),
            jax.ShapeDtypeStruct((q_n, e, LANE), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_n * e * deg_p * d,
            bytes_accessed=q_n * e * (deg_p * d + 2 * d + LANE * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        # flat 1D ids: a [Q, E] SMEM operand would be lane-padded to
        # [Q, 128] (2 MB at Q=4096 — over the 1 MB SMEM budget)
        sel_ids.reshape(-1),
        queries.reshape(q_n, 1, d),
        *([packed_vecs] * e),
        *([packed_ids.reshape(-1, 1, LANE)] * e),
        *([packed_scales.reshape(-1, 1, LANE)] * e),
    )
    return sims, nbrs


def beam_expand_reference(
    sel_ids: np.ndarray,
    queries: np.ndarray,
    packed_vecs: np.ndarray,
    packed_ids: np.ndarray,
    packed_scales: np.ndarray,
    deg_p: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy oracle of beam_expand for tests."""
    q_n, e = sel_ids.shape
    if queries.shape[1] != packed_vecs.shape[1]:  # pack-time lane padding
        queries = np.pad(
            queries, ((0, 0), (0, packed_vecs.shape[1] - queries.shape[1]))
        )
    d = queries.shape[1]
    sims = np.full((q_n, e, LANE), -np.inf, np.float32)
    nbrs = np.full((q_n, e, LANE), -1, np.int32)
    vecs = np.asarray(packed_vecs, np.float32).reshape(-1, deg_p, d)
    for qi in range(q_n):
        for j in range(e):
            node = int(sel_ids[qi, j])
            slab = vecs[node]  # [deg_p, d]
            sims[qi, j, :deg_p] = slab @ np.asarray(queries[qi], np.float32)
            sims[qi, j] *= np.asarray(packed_scales[node], np.float32)
            nbrs[qi, j] = packed_ids[node]
    return sims, nbrs
