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
  * profile [A_PAD=32, Lt, K] bf16 — plane a holds BLOSUM[t[j,k], a];
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


def _sw_kernel(q_ref, profile_ref, out_ref, h_ref, f_ref, best_ref,
               *, lq, lt, gap_first):
    k = out_ref.shape[-1]
    # int iota → f32 cast (Mosaic's tpu.iota is integer-only)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (lt, k), 0).astype(
        jnp.float32
    )

    h_ref[...] = jnp.zeros((lt, k), jnp.float32)
    f_ref[...] = jnp.full((lt, k), NEG, jnp.float32)
    best_ref[...] = jnp.zeros_like(best_ref)

    g = pl.program_id(0)

    def row(r, _):
        qi = q_ref[g, r]
        safe = jnp.clip(qi, 0, A_PAD - 1)
        plane = profile_ref[0, safe].astype(jnp.float32)  # [Lt, K] VMEM
        # query-padding rows (qi < 0) knock out every position — same
        # where the XLA kernels apply on `sub`
        sub = jnp.where(qi < 0, jnp.float32(NEG), plane)
        h_prev = h_ref[...]
        f_prev = f_ref[...]
        diag = jnp.concatenate(
            [jnp.zeros((1, k), jnp.float32), h_prev[:-1]], axis=0
        )
        f_new = jnp.maximum(h_prev - gap_first, f_prev - GAP_EXT)
        h0 = jnp.maximum(jnp.maximum(diag + sub, f_new), 0.0)
        # prefix max over the target axis (log2(Lt) shift+max sweeps):
        # E[j] = max_{i<j} H0[i] + i·ext − (gap_first − ext) − j·ext
        p = h0 + j_idx * GAP_EXT
        s = 1
        while s < lt:
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
        best_ref[...] = jnp.maximum(
            best_ref[...], jnp.max(h_new, axis=0, keepdims=True)
        )
        h_ref[...] = h_new
        f_ref[...] = f_new
        return 0

    jax.lax.fori_loop(0, lq, row, 0)
    out_ref[...] = best_ref[...].reshape(out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("convention", "interpret")
)
def sw_scores_grouped_pallas(
    q_codes: jnp.ndarray,  # [G, Lq] int32, -1 padding
    t_codes: jnp.ndarray,  # [G, K, Lt] int32, -1 padding
    convention: str = "blast",
    interpret: bool = None,
) -> jnp.ndarray:
    """Local-alignment scores [G, K] — bit-identical to
    sw_scores_grouped, VMEM-resident DP (see module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gap_first = GAP_FIRST[convention]
    g_n, lq = q_codes.shape
    _, k_n, lt = t_codes.shape
    if lt * k_n > MAX_LT_K:
        raise ValueError(
            f"Lt*K = {lt * k_n} exceeds the VMEM budget {MAX_LT_K}; "
            "shrink K for long targets (align drivers swap pairs so the "
            "target axis is the shorter side)"
        )
    if k_n % 128:
        raise ValueError("K must be a multiple of 128 (the lane width)")
    profile = build_profile(t_codes)

    out = pl.pallas_call(
        functools.partial(
            _sw_kernel, lq=lq, lt=lt, gap_first=float(gap_first)
        ),
        grid=(g_n,),
        in_specs=[
            # whole-array SMEM (blocked 2D SMEM operands trip the (8,128)
            # tile rule); the kernel indexes [program_id, row]
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, A_PAD, lt, k_n), lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # [G, 1, K] output: a (1, 1, K) block satisfies the (8, 128)
        # tile rule by matching the array's trailing dims exactly
        out_specs=pl.BlockSpec(
            (1, 1, k_n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_n, 1, k_n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((lt, k_n), jnp.float32),
            pltpu.VMEM((lt, k_n), jnp.float32),
            pltpu.VMEM((1, k_n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * g_n * k_n * lq * lt,
            bytes_accessed=g_n * (A_PAD * lt * k_n * 2 + lq * 4 + k_n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_codes.astype(jnp.int32), profile)
    return out[:, 0]
