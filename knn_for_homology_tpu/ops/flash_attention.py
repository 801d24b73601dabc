"""Pallas flash-attention forward kernel with Toeplitz T5 relative bias.

The encoder's attention for long proteins, as one fused kernel: for each
query block, key/value blocks stream through VMEM while the online-softmax
state (running max m, normaliser l, fp32 accumulator) lives in scratch —
the [L, L] score matrix never exists (guide: flash-attention pattern).

T5's relative-position bias depends only on (k_pos − q_pos), so the bias
matrix is Toeplitz: with equal q/k block sizes c there are only
(n_blocks_q + n_blocks_k − 1) distinct [c, c] bias blocks. They are
precomputed once per encode (shared by all layers) and the kernel's
index_map selects block (kj − qi) — no O(L²) bias tensor, no in-kernel
bucket math (an in-kernel 32-way gather emulation spilled ~128 MB of
registers on Mosaic).

Grid: (batch, heads, q_blocks, kv_blocks) — kv innermost, sequential on
TPU, so scratch carries across kv steps. Inference-only (no VJP); the
reference pipeline never trains the pLM.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def toeplitz_bias_blocks(
    rel_embedding: jnp.ndarray,  # [buckets, H]
    n_q_blocks: int,
    n_k_blocks: int,
    block: int,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """[n_rel, H, block, block] distinct bias blocks; rel block index
    r = kj − qi + (n_q_blocks − 1)."""
    from ..models.t5 import relative_position_bucket

    n_rel = n_q_blocks + n_k_blocks - 1
    base = (jnp.arange(n_rel) - (n_q_blocks - 1)) * block  # [n_rel]
    within = jnp.arange(block)
    rel = base[:, None, None] + within[None, None, :] - within[None, :, None]
    buckets = relative_position_bucket(rel, num_buckets, max_distance)
    bias = rel_embedding[buckets]  # [n_rel, block, block, H]
    return jnp.transpose(bias, (0, 3, 1, 2)).astype(jnp.float32)


def _flash_kernel(
    q_ref,  # [1, 1, Bq, dk]
    k_ref,  # [1, 1, Bk, dk]
    v_ref,  # [1, 1, Bk, dk]
    mask_ref,  # [B, Bk] int32 — full batch dim (Mosaic sublane rule)
    bias_ref,  # [1, 1, Bq, Bk] — Toeplitz block selected by index_map
    o_ref,  # [1, 1, Bq, dk]
    m_scr,  # [Bq, 1] fp32
    l_scr,  # [Bq, 1] fp32
    acc_scr,  # [Bq, dk] fp32
):
    kj = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk] — T5: no 1/sqrt(dk) scale
    scores = scores + bias_ref[0, 0]
    kv_mask = mask_ref[pl.program_id(0)] != 0
    scores = jnp.where(kv_mask[None, :], scores, NEG)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    # zero masked keys explicitly: when every key so far is masked the
    # running max equals the mask fill and exp(0)=1 would average garbage
    p = jnp.exp(scores - m_new) * kv_mask[None, :].astype(jnp.float32)
    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(kj == n_k - 1)
    def _emit():
        o_ref[0, 0] = (
            acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "num_buckets", "max_distance", "interpret"),
)
def flash_attention_t5(
    q: jnp.ndarray,  # [B, H, L, dk]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, L] bool
    rel_embedding: jnp.ndarray,  # [buckets, H]
    block: int = 512,
    num_buckets: int = 32,
    max_distance: int = 128,
    interpret: bool = None,
) -> jnp.ndarray:
    """→ context [B, H, L, dk]. L is padded to the block size internally;
    padded keys are masked out, padded query rows are dropped."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, dk = q.shape
    block = min(block, max(128, l))
    pad = (-l) % block
    l_p = l + pad
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    mask = mask.astype(jnp.int32)
    n_blocks = l_p // block
    bias_blocks = toeplitz_bias_blocks(
        rel_embedding, n_blocks, n_blocks, block, num_buckets, max_distance
    )

    grid = (b, h, n_blocks, n_blocks)
    out = pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block, dk),
                lambda bi, hi, qi, kj: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block, dk),
                lambda bi, hi, qi, kj: (bi, hi, kj, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block, dk),
                lambda bi, hi, qi, kj: (bi, hi, kj, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (b, block),
                lambda bi, hi, qi, kj: (0, kj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block, block),
                # Toeplitz: the bias block depends only on kj - qi
                lambda bi, hi, qi, kj, _n=n_blocks: (kj - qi + _n - 1, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block, dk),
            lambda bi, hi, qi, kj: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, l_p, dk), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, dk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l_p * l_p * dk,
            bytes_accessed=3 * b * h * l_p * dk * q.dtype.itemsize,
            transcendentals=b * h * l_p * l_p,
        ),
        interpret=interpret,
    )(q, k, v, mask, bias_blocks)
    return out[:, :, :l]
