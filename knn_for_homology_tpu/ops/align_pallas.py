"""Pallas Smith-Waterman: the VMEM-resident query-grouped DP kernel.

Why this exists (measured, r4): every XLA formulation of the row scan —
pair-batched one-hot contraction, outer-scan grouped, batched-G grouped
— converged to ~5-6 G DP cells/s, ~20× above the pure-VPU op count,
because the [Lt, B] DP state makes an HBM round-trip at every
non-fused op inside the scan body (the associative prefix-max alone
forces ~10 materialisations per row; scripts/profile_align_grouped.py).
This kernel keeps H, F and the per-target substitution profile in VMEM
for the whole query, so a DP row costs only VPU work; the row loop is a
hardware loop (Mosaic), which also collapses the XLA-While per-shape
compile cost (~85 s per fresh shape, the r2/r3 warm-up complaint) to
seconds.

Same math as ops/align.py's _dp_row (the H0-prefix-max affine gap
formulation, exact for affine costs); scores are bit-identical to
sw_scores_grouped — CI asserts it in interpret mode, the TPU-gated test
against the compiled kernel.

Layout per group g (grid step):
  * profile [A_PAD, Lt, K] bf16 (A_PAD = the alphabet size, 24 — the
    leading axis is untiled, so no padding applies) — plane a holds
    BLOSUM[t[j,k], a];
    target-padding positions hold the -1e9 knockout in EVERY plane, so
    the kernel needs no separate pad mask. bf16 is exact for BLOSUM
    integers and the knockout only needs magnitude.
  * q codes ride SMEM; each row dynamically indexes one [Lt, K] plane —
    a VMEM read, not the HBM gather that bound the XLA versions.
  * H/F state and the running best live in VMEM scratch.

Shape budget: profile (double-buffered) + 2 f32 states must fit ~12 MB
of VMEM → Lt·K ≤ 64k with K multiple of 128 (the caller swaps each pair
so the TARGET axis is the shorter sequence and long-tail shapes shrink
K instead of dying).

Reference workload: the `mmseqs align` rescoring step
(pfam/proteins.py:140-141, 5m37s CPU for the full-protein prefilter).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import BLOSUM62, GAP_EXT, GAP_FIRST, NEG

# the residue axis is the LEADING profile axis — untiled, so no padding
# (the (8, 128) tile rule binds only the last two dims)
A_PAD = BLOSUM62.shape[0]
MAX_LT_K = 1 << 16  # VMEM budget: profile 3 MB bf16 (×2 buffered) + state
# the HBM-profile variant only keeps H/F/best (f32) + a double-buffered
# plane (bf16) in VMEM: ~13·Lt·K bytes ≤ ~7.7 MB → covers Lt=2048 at K=256
MAX_LT_K_HBM = 589824
# segment-id offset for ragged lanes (multiple targets per lane, -1
# separators): the segmented prefix max rides p + seg·SEG_BIG, which must
# stay exact in f32 — SEG_BIG > any real |p| (score ≤ 11·lane_len ≤
# 11·4608 < 2^17 at the MAX_LT_K_HBM cap; j·ext ≤ 4608) and
# MAX_SEGMENTS·SEG_BIG + p < 2^24 (f32 exact-integer range)
SEG_BIG = float(1 << 17)
MAX_SEGMENTS = 63


@functools.partial(jax.jit, static_argnames=())
def build_profile(t_codes: jnp.ndarray) -> jnp.ndarray:
    """[G, K, Lt] int32 target codes → [G, A_PAD, Lt, K] bf16 profile
    with the pad knockout baked in (see module docstring)."""
    n_aa = BLOSUM62.shape[0]
    t_t = jnp.swapaxes(t_codes, 1, 2)  # [G, Lt, K]
    t_safe = jnp.clip(t_t, 0, n_aa - 1)
    onehot_t = jax.nn.one_hot(t_safe, n_aa, dtype=jnp.float32)
    profile = jnp.einsum(
        "gjkc,ca->gajk", onehot_t, jnp.asarray(BLOSUM62, jnp.float32)
    )  # [G, A, Lt, K]
    profile = jnp.where(
        (t_t < 0)[:, None, :, :], jnp.float32(NEG), profile
    )
    return profile.astype(jnp.bfloat16)


def _dp_step(plane, qi, h_ref, f_ref, best_ref, j_idx, lt, k, gap_first,
             segoff=None, sweep_to=None):
    """One DP row against a VMEM-resident [Lt, K] substitution plane —
    shared by the resident-profile and HBM-profile kernels (identical
    math to ops/align._dp_row; the two cannot drift).

    `segoff` (ragged lanes) carries seg_id·SEG_BIG per position, BAKED
    into the DP state permanently: H is initialised to segoff and the SW
    zero-floor becomes a segoff-floor, so H/F/best all ride their
    segment's offset and the prefix-max sweeps are SEGMENTED for free
    (an earlier segment's entries ride a smaller offset, so they can
    never win inside a later segment — exact because every quantity is
    an integer-valued f32 below 2^24). Baking removes the two per-row
    [Lt, K] add/subtract passes the r5-initial version paid around the
    sweeps; `_seg_reduce` subtracts the offset once per cell instead.
    `sweep_to` bounds the sweeps at the longest segment instead of the
    lane width. best_ref is [1, K] (running lane max) unsegmented,
    [Lt, K] (per-position running max, segment-reduced after the row
    loop, offset-carrying) ragged.
    """
    # query-padding rows (qi < 0) knock out every position — same
    # where the XLA kernels apply on `sub`
    sub = jnp.where(qi < 0, jnp.float32(NEG), plane)
    h_prev = h_ref[...]
    f_prev = f_ref[...]
    diag = jnp.concatenate(
        [jnp.zeros((1, k), jnp.float32), h_prev[:-1]], axis=0
    )
    f_new = jnp.maximum(h_prev - gap_first, f_prev - GAP_EXT)
    h0 = jnp.maximum(
        jnp.maximum(diag + sub, f_new),
        jnp.float32(0.0) if segoff is None else segoff,
    )
    # prefix max over the target axis (log2(Lt) shift+max sweeps):
    # E[j] = max_{i<j} H0[i] + i·ext − (gap_first − ext) − j·ext
    p = h0 + j_idx * GAP_EXT
    s = 1
    while s < (lt if sweep_to is None else sweep_to):
        shifted = jnp.concatenate(
            [jnp.full((s, k), NEG, jnp.float32), p[:-s]], axis=0
        )
        p = jnp.maximum(p, shifted)
        s *= 2
    pshift = jnp.concatenate(
        [jnp.full((1, k), NEG, jnp.float32), p[:-1]], axis=0
    )
    e_new = pshift - (gap_first - GAP_EXT) - j_idx * GAP_EXT
    h_new = jnp.maximum(h0, e_new)
    if segoff is None:
        best_ref[...] = jnp.maximum(
            best_ref[...], jnp.max(h_new, axis=0, keepdims=True)
        )
    else:
        best_ref[...] = jnp.maximum(best_ref[...], h_new)
    h_ref[...] = h_new
    f_ref[...] = f_new


def _seg_init(plane0, lt, k):
    """[Lt, K] seg_id·SEG_BIG from residue-0 substitution plane: separator
    and pad positions carry the NEG knockout in EVERY plane, so an
    inclusive prefix COUNT of knockouts along the target axis numbers the
    segments (the separator column itself joins the NEXT segment — its
    prefix-max window is then empty, so no alignment can extend across).
    Trailing pad positions keep incrementing but cap at MAX_SEGMENTS; they
    are knocked out, so their (unread) output slots just hold 0."""
    c = (plane0.astype(jnp.float32) <= jnp.float32(NEG / 2)).astype(
        jnp.float32
    )
    s = 1
    while s < lt:
        shifted = jnp.concatenate(
            [jnp.zeros((s, k), jnp.float32), c[:-s]], axis=0
        )
        c = c + shifted
        s *= 2
    return jnp.minimum(c, float(MAX_SEGMENTS)) * SEG_BIG


def _seg_reduce(best, segoff, segments, k):
    """[Lt, K] offset-carrying per-position best → [1, S, K] per-segment
    scores: mask to the segment's positions, max, subtract the baked
    s_i·SEG_BIG offset, clamp at 0 (SW best is ≥ 0 by definition, so
    empty/absent segments — whose masked max reads 0 — land on 0)."""
    outs = []
    for s_i in range(segments):
        m = segoff == (s_i * SEG_BIG)
        outs.append(jnp.maximum(
            jnp.max(jnp.where(m, best, 0.0), axis=0, keepdims=True)
            - s_i * SEG_BIG,
            0.0,
        ))
    return jnp.stack(outs, axis=1)  # [1, S, K]


def _sw_kernel(q_ref, profile_ref, out_ref, h_ref, f_ref, best_ref,
               *, lq, lt, gap_first, segments=1, sweep_to=None):
    k = out_ref.shape[-1]
    # int iota → f32 cast (Mosaic's tpu.iota is integer-only)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (lt, k), 0).astype(
        jnp.float32
    )

    segoff = (
        None if segments == 1
        else _seg_init(profile_ref[0, 0], lt, k)
    )
    # baked offsets: H starts AT its segment's floor (see _dp_step)
    h_ref[...] = (
        jnp.zeros((lt, k), jnp.float32) if segoff is None else segoff
    )
    f_ref[...] = jnp.full((lt, k), NEG, jnp.float32)
    best_ref[...] = jnp.zeros_like(best_ref)

    g = pl.program_id(0)

    def row(r, _):
        qi = q_ref[g, r]
        safe = jnp.clip(qi, 0, A_PAD - 1)
        plane = profile_ref[0, safe].astype(jnp.float32)  # [Lt, K] VMEM
        _dp_step(plane, qi, h_ref, f_ref, best_ref, j_idx, lt, k,
                 gap_first, segoff=segoff, sweep_to=sweep_to)
        return 0

    jax.lax.fori_loop(0, lq, row, 0)
    if segments == 1:
        out_ref[...] = best_ref[...].reshape(out_ref.shape)
    else:
        out_ref[...] = _seg_reduce(best_ref[...], segoff, segments, k)


def _sw_kernel_hbm(q_ref, profile_hbm, out_ref, h_ref, f_ref, best_ref,
                   plane_buf, psem, *, lq, lt, gap_first, segments=1,
                   sweep_to=None):
    """Long-target variant: the profile stays in HBM; each row's residue
    plane is DMA'd into a double-buffered VMEM slot while the previous
    row computes. Per-row traffic is Lt·K·2 bytes against Lt·K DP cells
    of VPU work, so the stream hides under compute for every Lt this
    kernel accepts (the resident kernel stays the fast path at
    Lt·K ≤ MAX_LT_K). Ragged lanes (`segments` > 1) derive the segment
    map from residue plane 0, DMA'd once before the row pipeline starts."""
    k = out_ref.shape[-1]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (lt, k), 0).astype(
        jnp.float32
    )

    h_ref[...] = jnp.zeros((lt, k), jnp.float32)
    f_ref[...] = jnp.full((lt, k), NEG, jnp.float32)
    best_ref[...] = jnp.zeros_like(best_ref)

    g = pl.program_id(0)

    segoff = None
    if segments > 1:
        cp0 = pltpu.make_async_copy(
            profile_hbm.at[g, 0], plane_buf.at[0], psem.at[0]
        )
        cp0.start()
        cp0.wait()
        segoff = _seg_init(plane_buf[0], lt, k)
        h_ref[...] = segoff  # baked offsets: H starts at its floor

    def plane_copy(slot, r):
        qi = q_ref[g, r]
        safe = jnp.clip(qi, 0, A_PAD - 1)
        return pltpu.make_async_copy(
            profile_hbm.at[g, safe],
            plane_buf.at[slot],
            psem.at[slot],
        )

    plane_copy(0, 0).start()

    def row(r, _):
        slot = r % 2
        plane_copy(slot, r).wait()

        @pl.when(r + 1 < lq)
        def _prefetch():
            plane_copy((r + 1) % 2, r + 1).start()

        plane = plane_buf[slot].astype(jnp.float32)
        _dp_step(plane, q_ref[g, r], h_ref, f_ref, best_ref, j_idx, lt,
                 k, gap_first, segoff=segoff, sweep_to=sweep_to)
        return 0

    jax.lax.fori_loop(0, lq, row, 0)
    if segments == 1:
        out_ref[...] = best_ref[...].reshape(out_ref.shape)
    else:
        out_ref[...] = _seg_reduce(best_ref[...], segoff, segments, k)


@functools.partial(
    jax.jit, static_argnames=("convention", "interpret", "segments",
                              "max_seg_len")
)
def sw_scores_grouped_pallas(
    q_codes: jnp.ndarray,  # [G, Lq] int32, -1 padding
    t_codes: jnp.ndarray,  # [G, K, Lt] int32, -1 padding
    convention: str = "blast",
    interpret: bool = None,
    segments: int = 1,
    max_seg_len: int = None,
) -> jnp.ndarray:
    """Local-alignment scores [G, K] — bit-identical to
    sw_scores_grouped, VMEM-resident DP (see module docstring).

    `segments` > 1 enables RAGGED LANES: each lane may hold several
    targets back to back, separated by (at least) one -1 code; the
    output is then [G, segments, K] with slot (g, s, k) scoring lane k's
    (s+1)-th target (0 for absent segments). This collapses the per-group
    lane-length padding that dominated the align anchor's 1.84× pad
    factor (ops/align.align_hits packs with it). `max_seg_len` (static)
    optionally bounds the prefix-max sweeps at the longest single target
    instead of the lane width."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gap_first = GAP_FIRST[convention]
    g_n, lq = q_codes.shape
    _, k_n, lt = t_codes.shape
    if lt * k_n > MAX_LT_K_HBM:
        raise ValueError(
            f"Lt*K = {lt * k_n} exceeds even the HBM-profile VMEM budget"
            f" {MAX_LT_K_HBM}; shrink K for long targets (align drivers"
            " swap pairs so the target axis is the shorter side)"
        )
    if k_n % 128:
        raise ValueError("K must be a multiple of 128 (the lane width)")
    if not 1 <= segments <= MAX_SEGMENTS:
        raise ValueError(f"segments must be in [1, {MAX_SEGMENTS}]")
    sweep_to = (
        None if max_seg_len is None else min(max(max_seg_len, 1), lt)
    )
    profile = build_profile(t_codes)

    # resident profile while it fits VMEM; HBM profile + per-row plane
    # DMA for the long-target tail (DMA is unavailable in interpret mode
    # — interpret always takes the resident kernel, which has no VMEM
    # ceiling there; the TPU-gated parity test covers the compiled HBM
    # path)
    hbm = (not interpret) and lt * k_n > MAX_LT_K
    # best_ref: [1, K] running lane max classic, [Lt, K] per-position
    # ragged (segment-reduced once after the row loop)
    best_shape = (1, k_n) if segments == 1 else (lt, k_n)
    if hbm:
        kernel = functools.partial(
            _sw_kernel_hbm, lq=lq, lt=lt, gap_first=float(gap_first),
            segments=segments, sweep_to=sweep_to,
        )
        profile_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [
            pltpu.VMEM((lt, k_n), jnp.float32),
            pltpu.VMEM((lt, k_n), jnp.float32),
            pltpu.VMEM(best_shape, jnp.float32),
            pltpu.VMEM((2, lt, k_n), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _sw_kernel, lq=lq, lt=lt, gap_first=float(gap_first),
            segments=segments, sweep_to=sweep_to,
        )
        profile_spec = pl.BlockSpec(
            (1, A_PAD, lt, k_n), lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch = [
            pltpu.VMEM((lt, k_n), jnp.float32),
            pltpu.VMEM((lt, k_n), jnp.float32),
            pltpu.VMEM(best_shape, jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(g_n,),
        in_specs=[
            # whole-array SMEM (blocked 2D SMEM operands trip the (8,128)
            # tile rule); the kernel indexes [program_id, row]
            pl.BlockSpec(memory_space=pltpu.SMEM),
            profile_spec,
        ],
        # [G, S, K] output: a (1, S, K) block satisfies the (8, 128)
        # tile rule by matching the array's trailing dims exactly
        out_specs=pl.BlockSpec(
            (1, segments, k_n), lambda g: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g_n, segments, k_n), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=40 * g_n * k_n * lq * lt,
            bytes_accessed=g_n * (
                (lq if hbm else A_PAD) * lt * k_n * 2 + lq * 4 + k_n * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_codes.astype(jnp.int32), profile)
    return out[:, 0] if segments == 1 else out
