"""Exact large-k selection via bitwise threshold search — EXPERIMENTAL.

`lax.top_k` sorts whole rows (measured 0.96 s for one [4096, 131072] fp32
block on a v5e — the entire exact-mode budget). Selection doesn't need a
sort, and the threshold search below is exact and cheap (32 fused
compare+reduce passes ≈ HBM-bound ~0.2 s/block). **However**: the final
compaction step is a scatter, and XLA lowers TPU scatter through a sort —
measured 9.4 s/block end-to-end, i.e. 10× WORSE than `lax.top_k`. The
algorithm is therefore correct (tests pin it against `lax.top_k`) but NOT
wired into the engine; turning it into a win requires a Pallas kernel that
does the compaction with in-VMEM counters instead of XLA scatter. Kept as
the worked design + correctness harness for that kernel. The production
exact path remains one-shot `lax.top_k` (ops/topk.py); the production fast
path is `approx_max_k` at measured recall 0.974.

The sort-free selection design:

  1. map fp32 keys to order-preserving uint32,
  2. binary-search the k-th largest key per row over the 32 bits — each of
     the 32 steps is one compare+popcount pass over the block (HBM-bound,
     ~4 GB/pass at [8192, 131072]),
  3. survivors (keys ≥ θ) are ≈k per row; their output slots are a cumsum;
     one scatter compacts (value, id) pairs into a [Q, k + slack] buffer,
  4. a final tiny `top_k` over the buffer orders the k results (and absorbs
     θ-ties deterministically).

Exactness: θ is the true k-th largest key (bit-exact); every true top-k
element survives the threshold. If a row has more than `slack` keys equal
to θ (astronomically unlikely for fp32 similarity data, and impossible when
all row values are distinct), the surplus ties are dropped — the same
arbitrary tie resolution a heap-based FAISS search applies.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-np.inf)


def _ordered_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone fp32 → uint32: a > b ⇔ ordered(a) > ordered(b)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = bits >> 31
    # negative: flip all bits; non-negative: set the sign bit
    return jnp.where(sign == 1, ~bits, bits | jnp.uint32(0x80000000))


@functools.partial(jax.jit, static_argnames=("k", "slack"))
def threshold_topk(
    sims: jnp.ndarray,  # [Q, N] fp32
    k: int,
    slack: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (vals [Q, k] desc, ids [Q, k] int32) of each row's top-k."""
    q, n = sims.shape
    k = min(k, n)

    # per-row k-th largest key: 32-step bitwise binary search.
    # invariant: theta is the largest prefix with count(keys >= theta) >= k.
    # ordered bits are recomputed inside each pass so the uint32 key tensor
    # fuses into the compare+reduce instead of occupying [Q, N] HBM.
    def bit_step(i, theta):
        candidate = theta | (jnp.uint32(1) << (31 - i))
        count = jnp.sum(
            (_ordered_bits(sims) >= candidate[:, None]).astype(jnp.int32),
            axis=1,
        )
        return jnp.where(count >= k, candidate, theta)

    theta = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((q,), jnp.uint32)
    )

    survivor = _ordered_bits(sims) >= theta[:, None]
    # output slot of each survivor = its rank among survivors by column
    slots = jnp.cumsum(survivor.astype(jnp.int32), axis=1) - 1
    width = k + slack
    slots = jnp.where(survivor & (slots < width), slots, width)  # drop rest

    vals_buf = jnp.full((q, width + 1), NEG_INF)
    ids_buf = jnp.full((q, width + 1), -1, dtype=jnp.int32)
    rows = jnp.arange(q, dtype=jnp.int32)[:, None]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    vals_buf = vals_buf.at[rows, slots].set(sims, mode="drop")
    ids_buf = ids_buf.at[rows, slots].set(col_ids, mode="drop")
    vals_buf, ids_buf = vals_buf[:, :width], ids_buf[:, :width]

    # order the ≈k survivors; ties at θ resolve by the scatter's last-wins
    # then this top_k's index order — deterministic either way
    top_vals, sel = jax.lax.top_k(vals_buf, k)
    return top_vals, jnp.take_along_axis(ids_buf, sel, axis=1)
