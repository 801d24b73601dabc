"""LSH binary-sketch ops — random hyperplane signs + Hamming top-k.

Replaces FAISS IndexLSH (reference: seqvec_search/create_index.py:41,
pfam/search.py:27, pfam/proteins_search.py:26-27 — 1024/2048-bit sketches).

TPU-first formulation: the Hamming distance between sign sketches s ∈ {-1,+1}
is (nbits − s_q·s_db)/2, so the whole search is an int8 matmul on the MXU
followed by the same streaming top-k merge as the exact engine — no scalar
popcount loops. Sketches are persisted bit-packed (uint32) and expanded to
int8 on device.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)


def projection_matrix(dim: int, nbits: int, seed: int = 1234) -> np.ndarray:
    """Random Gaussian hyperplanes [dim, nbits]; fixed seed → reproducible
    index (the reference relies on FAISS's internal fixed RNG the same way)."""
    rng = np.random.RandomState(seed)
    return rng.randn(dim, nbits).astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def compute_signs(x: jnp.ndarray, projection: jnp.ndarray) -> jnp.ndarray:
    """int8 sign sketch [N, nbits] of rows of x."""
    proj = jnp.dot(x, projection, preferred_element_type=jnp.float32)
    return jnp.where(proj >= 0, jnp.int8(1), jnp.int8(-1))


def pack_signs(signs: np.ndarray) -> np.ndarray:
    """int8 ±1 [N, nbits] → packed uint8 [N, nbits/8] (persistence format)."""
    bits = (np.asarray(signs) > 0).astype(np.uint8)
    return np.packbits(bits, axis=1)


def unpack_signs(packed: np.ndarray, nbits: int) -> np.ndarray:
    bits = np.unpackbits(np.asarray(packed), axis=1)[:, :nbits]
    return (bits.astype(np.int8) * 2 - 1).astype(np.int8)


@functools.partial(jax.jit, static_argnames=("k", "db_tile"))
def hamming_topk(
    db_signs: jnp.ndarray,
    q_signs: jnp.ndarray,
    k: int,
    db_tile: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k smallest Hamming distances via int8 MXU matmul.

    db_signs [N, nbits] int8 ±1, q_signs [Q, nbits] int8 ±1.
    Returns (hamming [Q, k] float32 ascending, ids [Q, k] int32), id -1 / +inf
    for missing hits — FAISS's convention of returning distances as floats.
    """
    n, nbits = db_signs.shape
    q = q_signs.shape[0]
    k_eff = min(k, n)
    db_tile = min(db_tile, max(128, n))

    rem = (-n) % db_tile
    padded = jnp.pad(db_signs, ((0, rem), (0, 0))) if rem else db_signs
    num_tiles = padded.shape[0] // db_tile
    tiles = padded.reshape(num_tiles, db_tile, nbits)

    def step(carry, inputs):
        best_vals, best_ids = carry
        tile, tile_idx = inputs
        ip = jax.lax.dot_general(
            q_signs,
            tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sims = ip.astype(jnp.float32)  # maximise ip == minimise Hamming
        row_ids = tile_idx * db_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q, db_tile), 1
        )
        sims = jnp.where(row_ids < n, sims, NEG_INF)
        merged_vals = jnp.concatenate([best_vals, sims], axis=1)
        merged_ids = jnp.concatenate([best_ids, row_ids], axis=1)
        vals, sel = jax.lax.top_k(merged_vals, k_eff)
        return (vals, jnp.take_along_axis(merged_ids, sel, axis=1)), None

    init = (
        jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32),
        jnp.full((q, k_eff), -1, dtype=jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(
        step, init, (tiles, jnp.arange(num_tiles, dtype=jnp.int32))
    )
    hamming = (nbits - vals) * 0.5
    if k_eff < k:
        hamming = jnp.pad(
            hamming, ((0, 0), (0, k - k_eff)), constant_values=jnp.inf
        )
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return hamming, ids
