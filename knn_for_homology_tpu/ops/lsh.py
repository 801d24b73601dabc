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

NEG_INF = np.float32(-np.inf)


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


def _sign_ip(q_signs: jnp.ndarray, tile: jnp.ndarray) -> jnp.ndarray:
    """int8 ±1 inner product on the MXU — maximising it minimises Hamming
    (H = (nbits − s_q·s_db) / 2)."""
    ip = jax.lax.dot_general(
        q_signs,
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return ip.astype(jnp.float32)


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
    The tile-scan/merge machinery is ops/topk.streaming_topk with the int8
    similarity plugged in.
    """
    from .topk import streaming_topk

    n, nbits = db_signs.shape
    k_eff = min(k, n)
    vals, ids = streaming_topk(
        db_signs,
        q_signs,
        k_eff,
        metric="ip",
        db_tile=min(db_tile, max(128, n)),
        sim_fn=_sign_ip,
    )
    hamming = (nbits - vals) * 0.5
    if k_eff < k:
        hamming = jnp.pad(
            hamming, ((0, 0), (0, k - k_eff)), constant_values=jnp.inf
        )
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return hamming, ids
