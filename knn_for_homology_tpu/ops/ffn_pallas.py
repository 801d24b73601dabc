"""Fused T5 FFN block as one Pallas kernel: x + relu(rmsnorm(x)·wi)·wo.

The encoder roofline (scripts/roofline_encoder.py) holds the FFN's
[tokens, d_ff] round-trip at ~55% MXU in isolation: XLA materialises the
relu(x·wi) intermediate in HBM ([32768, 16384] bf16 = 1 GB written then
re-read) between the two matmuls. This kernel keeps the intermediate in
VMEM: for each token tile the d_ff axis streams through in `bf`-wide
slices, each slice doing wi-matmul → relu → wo-matmul into an fp32
accumulator, so nothing wider than [bm, bf] ever exists. The rms_norm
prologue and the residual-add epilogue ride along for free (they are
HBM-bound elementwise passes XLA would otherwise fuse into the matmuls'
edges anyway).

Grid: (token_tiles, d_ff_tiles) — d_ff innermost, sequential on TPU, so
the normed-input and accumulator scratch carry across d_ff steps while
wi/wo tiles stream (guide: accumulator-scratch matmul chain pattern).
Inference-only, like the rest of the encoder (the reference pipeline
never trains the pLM; reference: bio_embeddings T5 usage in
seqvec_search/embed.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(
    x_ref,  # [bm, D] input tokens (residual source)
    ln_ref,  # [1, D] rms scale
    wi_ref,  # [D, bf]
    wo_ref,  # [bf, D]
    o_ref,  # [bm, D]
    normed_scr,  # [bm, D] x.dtype
    acc_scr,  # [bm, D] fp32
    *,
    eps: float,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _prologue():
        x32 = x_ref[:].astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = (x32 * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
        normed_scr[:] = normed * ln_ref[0][None, :]
        acc_scr[:] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        normed_scr[:], wi_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, bf]
    h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    acc_scr[:] += jax.lax.dot_general(
        h, wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _epilogue():
        o_ref[:] = (
            x_ref[:].astype(jnp.float32) + acc_scr[:]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "bm", "bf", "interpret")
)
def fused_ffn_t5(
    x: jnp.ndarray,  # [T, D] tokens (caller flattens [B, L, D])
    ln_scale: jnp.ndarray,  # [D]
    wi: jnp.ndarray,  # [D, DFF]
    wo: jnp.ndarray,  # [DFF, D]
    eps: float = 1e-6,
    bm: int = 256,
    bf: int = 1024,
    interpret: bool = None,
) -> jnp.ndarray:
    """→ x + relu(rms_norm(x, ln_scale)·wi)·wo, [T, D].

    T is padded to the token tile internally (rms_norm is per-row, so
    padded rows never influence real ones). VMEM per step ≈
    bm·D·(2+2+4) + 2·bf·D·2·2 (double-buffered wi/wo) + bm·bf·4 bytes —
    the default (256, 1024) uses ~12.5 MB on D=1024, under the 16 MB
    scoped-VMEM ceiling (bf=2048 measured 18.54 MB and is rejected by
    Mosaic when the kernel sits inside a larger program, e.g. the
    24-layer encoder loop).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, d = x.shape
    dff = wi.shape[1]
    bm = min(bm, max(8, t))
    bf = min(bf, dff)
    assert dff % bf == 0, (dff, bf)
    pad = (-t) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    t_p = t + pad
    grid = (t_p // bm, dff // bf)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_p, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), x.dtype),
            pltpu.VMEM((bm, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * t_p * d * dff,
            bytes_accessed=(
                2 * t_p * d * x.dtype.itemsize
                + (t_p // bm) * 2 * d * dff * wi.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ln_scale.astype(x.dtype).reshape(1, d), wi, wo)
    return out[:t]
