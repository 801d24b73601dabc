"""Fused dense attention for SHORT sequences (the production regime).

The token-budget batcher (pipelines/embed.py) packs typical 150-350aa
proteins into short-wide batches (e.g. 128x256), where attention FLOPs are
negligible (4%% of a layer) but the XLA dense path's fp32 [B, H, L, L]
score tensor round-trips ~3 GB of HBM per layer — measured 13.2 ms/layer
at 128x256 against ~1 ms of ideal compute (scripts/roofline_encoder.py).
The flash kernel (ops/flash_attention.py) is wrong-shaped here too: its
(B, H, q_blocks, k_blocks) grid degenerates to 4096 tiny steps whose
per-step overhead dominates (17.6 ms measured).

This kernel runs ONE grid step per batch row with every head resident in
VMEM: per head, scores = QK^T + T5 bias -> masked softmax -> PV, with the
[L, L] score matrix living only in registers/VMEM. At L=256 the whole
working set is ~16 MB (q/k/v 2 MB each, shared bias 8 MB, out 2 MB);
gated to L <= 512 where the fp32 bias block still fits.

Numerics mirror models/t5.py:_attention exactly: fp32 scores, -1e9 mask
fill (an all-masked row softmaxes to uniform, never NaN), fp32 softmax,
probabilities cast to bf16, fp32 PV accumulation, output cast to the
model dtype. Inference-only (no VJP), like the flash kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
# per-step VMEM working-set budget for the head-group sizing (Mosaic's
# scoped limit is 16 MB; headroom for double-buffered input blocks)
VMEM_BUDGET = 14 * 2**20


def _short_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref):
    """Grid (head_groups, B) — batch innermost, so the group's bias block
    stays VMEM-resident while batch rows stream past it. q/k/v/o
    [1, Hg, L, dk]; mask [B, L] int32 (full batch in VMEM — Mosaic
    sublane rule, as in ops/flash_attention.py); bias [Hg, L, L] fp32."""
    kv_mask = mask_ref[pl.program_id(1)] != 0  # [L]
    # one BATCHED dot over the whole head group (batch dim = heads): a
    # per-head unrolled loop costs ~4 us of issue overhead per head
    # (measured 17.8 ms at 128x32x256 — no better than dense XLA);
    # batching lets Mosaic pipeline MXU and VPU across heads
    scores = jax.lax.dot_general(
        q_ref[0],
        k_ref[0],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hg, L, L] — T5: no 1/sqrt(dk) scale
    scores = scores + bias_ref[...]
    scores = jnp.where(kv_mask[None, None, :], scores, NEG)
    m = jnp.max(scores, axis=2, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def short_attention_t5(
    q: jnp.ndarray,  # [B, H, L, dk]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, L] bool
    bias: jnp.ndarray,  # [H, L, L] fp32 (position_bias, shared by layers)
    interpret: bool = None,
) -> jnp.ndarray:
    """→ context [B, H, L, dk]. L is padded to a lane multiple internally;
    padded keys are masked out, padded query rows dropped."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, dk = q.shape
    pad = (-l) % 128
    l_p = l + pad
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
    mask = mask.astype(jnp.int32)

    # Head-group split: all 32 XL heads at L=256 need ~16 MB of scoped
    # VMEM (q/k/v/o 2 MB each + 8 MB fp32 bias) — past Mosaic's 16 MB
    # budget. Pick the largest per-step head group whose working set fits;
    # Mosaic double-buffers EVERY block, bias included (measured: hg=16
    # was billed 18.24 MB = 2x the 9 MB single-buffered set), hence the
    # factor of two on the whole sum.
    hg = h
    while hg > 1 and 2 * (
        4 * hg * l_p * dk * q.dtype.itemsize
        + hg * l_p * l_p * 4
        + b * l_p * 4
    ) > VMEM_BUDGET:
        hg //= 2
    n_groups = h // hg

    out = pl.pallas_call(
        _short_kernel,
        grid=(n_groups, b),
        in_specs=[
            pl.BlockSpec(
                (1, hg, l_p, dk), lambda gi, bi: (bi, gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hg, l_p, dk), lambda gi, bi: (bi, gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hg, l_p, dk), lambda gi, bi: (bi, gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (b, l_p), lambda gi, bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (hg, l_p, l_p), lambda gi, bi: (gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, l_p, dk), lambda gi, bi: (bi, gi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, l_p, dk), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l_p * l_p * dk,
            bytes_accessed=4 * b * h * l_p * dk * q.dtype.itemsize
            + h * l_p * l_p * 4,
            transcendentals=b * h * l_p * l_p,
        ),
        interpret=interpret,
    )(q, k, v, mask, bias)
    return out[:, :, :l]
