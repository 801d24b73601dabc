"""Indirect segment-top-R scan over IVF slabs: gather-free union search.

Round-4 attribution of the IVF union scan (scripts/profile_ivf_union.py,
benchmarks/r4_campaigns.md:150-155) showed the assembled pipeline running
7-28× below its own scan piece: the probed cells' int8 slabs were
gathered into a contiguous buffer (one 268 MB XLA gather per block at the
high-recall point) and then re-read by the flat kernel — the union's
bytes crossed HBM three times (gather read + gather write + scan read),
and XLA row/slab gathers run far below stream rate.

This kernel deletes the gather: the union's cell ids ride as a
scalar-prefetch operand and each grid step's BlockSpec index_maps pick
`e` probed slabs straight out of the packed slab matrix (the same
embedding-gather pattern as ops/graph_pallas.beam_expand, but block-level:
all queries in the block score every selected slab, so each slab is
fetched ONCE per block instead of once per query). Scoring and selection
are exactly the flat engine's packed sq8-sym path (int8×int8→int32 MXU
dots, per-row dequant scales, one packed int32 per candidate slot): the
union's bytes now cross HBM exactly once, at stream rate.

Capacity-padding slots are masked by their packed id (-1) — no appended
bias lane, no +12.5 % buffer bytes, no query augmentation. ip/cosine
only: l2's −|row|² term needs the asymmetric kernel and stays on the
gather path (search/ivf.py gates it).

Plays the role of FAISS's IVF scan loop (the reference delegates to
IndexHNSWFlat, pfam/proteins_search.py:30-49); the slab layout is
ops/graph_pallas.pack_neighbours' and is shared with the DMA beam path.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import pad_rows
from .exact_pallas import (
    DEFAULT_R,
    INT32_MIN,
    _decode_packed,
    _pack_and_insert,
    _plan,
)
from .graph_pallas import LANE, quantize_int8

# slabs fetched per grid step: one [e*LANE, d] tile per insert pass keeps
# the per-pass state small (the packed engine's lever) while each DMA
# stays a full 128-row slab
SLABS_PER_STEP = 8


def _indirect_sq8sym_kernel(
    cells_ref, q_ref, *refs, e, r_slots, jbits, two_level
):
    """Grid (query_blocks, budget // e). Step (i, j) scores query block i
    against slabs cells[j*e : (j+1)*e] and inserts into the block's packed
    candidate buffer (revisited across j → VMEM-resident, exactly like the
    flat packed kernel's).

    `two_level` (compute="sym2") adds a second int8 pass over the RESIDUAL
    query q_lo = round((q/qsc − q_hi)·128): sims ∝ d_hi + d_lo/128, both
    dots exact in int32, so the query-side quantisation step shrinks
    127×256-fold — 16-bit-quality scores at 2× the int8 MAC cost, with NO
    fp32 rescore pass (and so no row gather, the r4 high-recall wall).
    The 1/128 ratio is a compile-time constant (the residual is quantised
    at qsc/128 by construction), so no per-query scale enters the kernel;
    the shared qsc stays a rank-neutral epilogue factor. The remaining
    caller-visible error is the int8 STORAGE quantisation (~0.07 % at
    d=1024) — the same floor the dequantised-slab fp32 rescore had."""
    del cells_ref  # consumed by the index_maps
    qlo_ref = refs[0] if two_level else None
    refs = refs[1:] if two_level else refs
    slabs = refs[:e]
    scs = refs[e : 2 * e]
    pids = refs[2 * e : 3 * e]
    buf_ref = refs[3 * e]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        buf_ref[:] = jnp.full_like(buf_ref, INT32_MIN)

    slab = jnp.concatenate([s[...] for s in slabs], axis=0)  # [e*LANE, d]
    # scale/id rows ride as [1, 1, LANE] blocks (Mosaic wants the last two
    # block dims divisible by (8, 128) OR equal to the array's — the 3D
    # view satisfies the latter, as in graph_pallas)
    sc = jnp.concatenate([s[...] for s in scs], axis=2).reshape(1, -1)
    pid = jnp.concatenate([p[...] for p in pids], axis=2).reshape(1, -1)

    def int8_dot(qr):
        return jax.lax.dot_general(
            qr,
            slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    sims = int8_dot(q_ref[:]).astype(jnp.float32)
    if two_level:
        sims = sims + int8_dot(qlo_ref[:]).astype(jnp.float32) * (1.0 / 128.0)
    sims = sims * sc
    # capacity-padding slots carry packed id -1 (their rows are zeros —
    # which would otherwise outrank genuinely negative similarities)
    _pack_and_insert(
        buf_ref, sims, pid >= 0, j, r_slots, slab.shape[0], jbits
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "r_slots", "query_block", "e", "jbits", "interpret"),
)
def _indirect_candidates(
    pv, sc, pi, cells, q8, q8_lo, k, r_slots, query_block, e, jbits,
    interpret,
):
    d = pv.shape[1]
    budget = cells.shape[0]
    tile = e * LANE
    two_level = q8_lo is not None
    q_p = pad_rows(q8, query_block)
    grid = (q_p.shape[0] // query_block, budget // e)
    width = r_slots * tile

    def slab_spec(u):
        return pl.BlockSpec(
            (LANE, d), lambda i, j, cells, u=u: (cells[j * e + u], 0)
        )

    def row_spec(u):
        return pl.BlockSpec(
            (1, 1, LANE), lambda i, j, cells, u=u: (cells[j * e + u], 0, 0)
        )

    q_spec = pl.BlockSpec((query_block, d), lambda i, j, cells: (i, 0))
    q_args = [q_p]
    q_specs = [q_spec]
    if two_level:
        q_args.append(pad_rows(q8_lo, query_block))
        q_specs.append(q_spec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            *q_specs,
            *[slab_spec(u) for u in range(e)],
            *[row_spec(u) for u in range(e)],
            *[row_spec(u) for u in range(e)],
        ],
        out_specs=pl.BlockSpec(
            (query_block, width), lambda i, j, cells: (i, 0)
        ),
    )
    buf = pl.pallas_call(
        functools.partial(
            _indirect_sq8sym_kernel, e=e, r_slots=r_slots, jbits=jbits,
            two_level=two_level,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_p.shape[0], width), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=(4 if two_level else 2) * q_p.shape[0] * budget * LANE * d,
            bytes_accessed=(
                q_p.shape[0] * d * (2 if two_level else 1)
                + grid[0] * budget * (LANE * d + LANE * 8)
                + q_p.shape[0] * width * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        cells.astype(jnp.int32), *q_args,
        *([pv] * e),
        *([sc.reshape(-1, 1, LANE)] * e),
        *([pi.reshape(-1, 1, LANE)] * e),
    )
    return buf[: q8.shape[0]]


def ivf_union_topk(
    pv: jnp.ndarray,  # [C*LANE, d] int8 packed slabs (lane-padded d)
    sc: jnp.ndarray,  # [C, LANE] f32 per-row dequant scales
    pi: jnp.ndarray,  # [C, LANE] int32 global ids (-1 padding)
    cells: jnp.ndarray,  # [budget] int32 DISTINCT cell ids to scan
    queries: jnp.ndarray,  # [Q, d_orig] f32
    k: int,
    recall_target: float = 0.995,
    query_block: int = 512,
    compute: str = "sym",
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (vals [Q, k] f32 desc, pos [Q, k] int32, ids [Q, k] int32).

    `pos` indexes the virtual slab-ordered buffer (cell slot
    `pos // LANE` within `cells`, lane `pos % LANE`) — the same
    convention as the gather path's, so the fp32 rescores are reusable.
    Empty slots carry (-inf, -1, -1). Traceable (static budget).

    `compute="sym"` is the one-pass int8 scan (~0.4 % query quantisation
    noise — fine when an fp32 rescore follows or recall sits in the 0.95
    class); `"sym2"` adds the residual int8 pass (see the kernel
    docstring) for storage-floor recall with no rescore pass at all."""
    if compute not in ("sym", "sym2"):
        raise ValueError(f"unknown compute {compute!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = pv.shape[1]
    budget = cells.shape[0]
    e = min(SLABS_PER_STEP, budget)
    # budgets are powers of two (search/ivf.py rounds them), so e divides
    assert budget % e == 0, (budget, e)
    n_passes = budget // e
    jbits = max(1, (n_passes - 1).bit_length())
    tile = e * LANE
    n_rows = budget * LANE
    k_eff = min(k, n_rows)
    q32 = queries.astype(jnp.float32)
    if q32.shape[1] != d:  # slabs are lane-padded at pack time
        q32 = jnp.pad(q32, ((0, 0), (0, d - q32.shape[1])))
    q8, qsc = quantize_int8(q32)
    q8_lo = None
    if compute == "sym2":
        # residual quantised at exactly qsc/128: |resid| <= qsc/2 per
        # element → codes <= 64, no clipping; the fixed ratio keeps the
        # kernel's combine a compile-time constant
        resid = q32 / qsc[:, None] - q8.astype(jnp.float32)
        q8_lo = jnp.round(resid * 128.0).astype(jnp.int8)
    _, query_block, r_slots, max_block = _plan(
        n_rows, d, k_eff, tile, query_block, DEFAULT_R, False,
        recall_target, 1,
    )
    outs = []
    for s in range(0, q8.shape[0], max_block):
        outs.append(
            _indirect_candidates(
                pv, sc, pi, cells, q8[s : s + max_block],
                None if q8_lo is None else q8_lo[s : s + max_block],
                k_eff, r_slots, query_block, e, jbits, interpret,
            )
        )
    buf = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    vals, pos = _decode_packed(buf, k_eff, tile, jbits)
    # per-query dequant scale: rank-neutral, folded after decode
    vals = vals * qsc[:, None]
    safe = jnp.clip(pos, 0, n_rows - 1)
    ids = pi[cells[safe // LANE], safe % LANE]
    ids = jnp.where(pos >= 0, ids, -1)
    if k_eff < k:
        pad = k - k_eff
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        pos = jnp.pad(pos, ((0, 0), (0, pad)), constant_values=-1)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return vals, pos, ids
