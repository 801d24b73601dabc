"""LSH index — the FAISS IndexLSH replacement.

Usage parity with the reference's index builds
(reference: seqvec_search/create_index.py:33-47 — 1024 bits default;
pfam/proteins_search.py:26-27 — 2048 bits; k=1000 queries
pfam/search.py:37). Scores returned are Hamming distances (ascending),
matching FAISS's convention.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.lsh import (
    compute_signs,
    hamming_topk,
    pack_signs,
    projection_matrix,
    unpack_signs,
)


class LSHIndex:
    def __init__(self, dim: int, nbits: int = 1024, seed: int = 1234):
        self.dim = dim
        self.nbits = nbits
        self.seed = seed
        self.projection = projection_matrix(dim, nbits, seed)
        self._signs: Optional[np.ndarray] = None  # int8 ±1 [N, nbits]

    @property
    def ntotal(self) -> int:
        return 0 if self._signs is None else self._signs.shape[0]

    def add(self, vectors: np.ndarray) -> "LSHIndex":
        signs = np.asarray(
            compute_signs(
                jnp.asarray(np.asarray(vectors, dtype=np.float32)),
                jnp.asarray(self.projection),
            )
        )
        self._signs = (
            signs
            if self._signs is None
            else np.concatenate([self._signs, signs], axis=0)
        )
        return self

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (hamming distances [Q, k] ascending, ids [Q, k])."""
        if self._signs is None:
            raise ValueError("index is empty; call add() first")
        q_signs = compute_signs(
            jnp.asarray(np.asarray(queries, dtype=np.float32)),
            jnp.asarray(self.projection),
        )
        dist, ids = hamming_topk(jnp.asarray(self._signs), q_signs, k)
        return np.asarray(dist), np.asarray(ids)

    # --- persistence payload (see search/io.py) ---
    def state(self) -> dict:
        return {
            "kind": "lsh",
            "dim": self.dim,
            "nbits": self.nbits,
            "seed": self.seed,
            "packed_signs": pack_signs(self._signs)
            if self._signs is not None
            else np.zeros((0, self.nbits // 8), dtype=np.uint8),
        }

    @classmethod
    def from_state(cls, state: dict) -> "LSHIndex":
        index = cls(int(state["dim"]), int(state["nbits"]), int(state["seed"]))
        packed = state["packed_signs"]
        if packed.shape[0]:
            index._signs = unpack_signs(packed, index.nbits)
        return index
