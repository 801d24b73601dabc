"""Exact flat index — the FAISS IndexFlat replacement, HBM-resident.

API mirrors the search semantics the reference drives through FAISS:
  * ``knn_search`` ↔ ``faiss_search`` (reference: seqvec_search/main.py:22-50):
    cosine pre-normalisation of queries+database, k hits, wall time.
  * ``FlatIndex.search_self`` ↔ all-vs-all with self-hit stripping
    (reference: cath/search.py:13-26): ask k+1, drop the first column.
  * fp16/bf16 inputs are cast to fp32 before search
    (reference: cath/search.py:39-40).

Backends:
  * "pallas" — fused distance+top-k kernel (ops/flat_pallas.py), k ≤ 32, TPU
  * "xla"    — streaming scan+top_k merge (ops/topk.py), any k, any platform
  * "approx" — streaming scan with jax.lax.approx_max_k (TPU-KNN style)
  * "sq8"    — approx packed segment-top-R over int8 storage + per-row
               dequant scales (FAISS IndexScalarQuantizer SQ8's trade):
               half the HBM stream of bf16 on the restream-bound engine
"""

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_HITS, SearchConfig
from ..ops.distance import METRICS, finalize_scores, l2_normalize
from ..ops.flat_pallas import MAX_PALLAS_K, pallas_flat_topk
from ..ops.topk import flat_topk


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pick_backend(backend: str, k: int) -> str:
    if backend != "auto":
        return backend
    if k <= MAX_PALLAS_K and _on_tpu():
        return "pallas"
    return "xla"


class FlatIndex:
    """Exact brute-force index over device-resident vectors."""

    def __init__(
        self,
        metric: str = "cosine",
        config: Optional[SearchConfig] = None,
        backend: str = "auto",
    ):
        if metric not in METRICS:
            raise ValueError(f"metric must be one of {METRICS}")
        self.metric = metric
        self.config = config or SearchConfig(metric=metric)
        self.backend = backend
        self._db: Optional[jnp.ndarray] = None
        self._db_sq8 = None  # lazy quantize-once cache (sq8 backend)

    @property
    def ntotal(self) -> int:
        return 0 if self._db is None else self._db.shape[0]

    @property
    def dim(self) -> Optional[int]:
        return None if self._db is None else self._db.shape[1]

    def add(self, vectors: np.ndarray) -> "FlatIndex":
        """Install database vectors (cast→fp32; cosine: normalised once here,
        not per query — the FAISS path re-normalises on every search)."""
        v = jnp.asarray(np.asarray(vectors), dtype=jnp.float32)
        if self.metric == "cosine":
            v = l2_normalize(v)
        new = v if self._db is None else jnp.concatenate([self._db, v], axis=0)
        self._db = jax.device_put(new)
        self._db_sq8 = None  # vectors changed: invalidate the sq8 cache
        return self

    def _prep_queries(self, queries: np.ndarray) -> jnp.ndarray:
        q = jnp.asarray(np.asarray(queries), dtype=jnp.float32)
        if self.metric == "cosine":
            q = l2_normalize(q)
        return q

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores [Q, k], ids [Q, k]) in the FAISS convention:
        cosine/ip descending inner products; l2 ascending squared distances;
        missing hits are id -1."""
        if self._db is None:
            raise ValueError("index is empty; call add() first")
        q = self._prep_queries(queries)
        backend = _pick_backend(self.backend, k)
        if backend == "pallas":
            sims, ids = pallas_flat_topk(
                self._db,
                q,
                k,
                metric=self.metric,
                db_tile=self.config.db_tile // 8,
                query_block=self.config.query_block // 4,
            )
        elif backend == "sq8":
            # quantise once, then every search skips the full-database
            # quantisation passes (several HBM sweeps per call otherwise)
            from ..ops.exact_pallas import packed_pallas_topk, quantize_database

            if self._db_sq8 is None:
                self._db_sq8 = quantize_database(self._db)
            sims, ids = packed_pallas_topk(
                self._db_sq8,
                q,
                k,
                metric="ip" if self.metric == "cosine" else self.metric,
                recall_target=self.config.recall_target,
            )
        else:
            sims, ids = flat_topk(
                self._db,
                q,
                k,
                metric=self.metric,
                db_tile=self.config.db_tile,
                approx=(backend == "approx"),
                recall_target=self.config.recall_target,
            )
        scores = finalize_scores(sims, self.metric)
        return np.asarray(scores), np.asarray(ids)

    # --- persistence payload (see search/io.py) ---
    def state(self) -> dict:
        return {
            "kind": "flat",
            "metric": self.metric,
            "vectors": np.asarray(self._db)
            if self._db is not None
            else np.zeros((0, 0), dtype=np.float32),
        }

    @classmethod
    def from_state(cls, state: dict) -> "FlatIndex":
        index = cls(metric=str(state["metric"]))
        vectors = state["vectors"]
        if vectors.size:
            # stored vectors are already normalised for cosine; install raw
            index._db = jnp.asarray(vectors, dtype=jnp.float32)
        return index

    def search_self(self, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """All-vs-all with self-hit stripping: ask k+1, drop column 0
        (reference: cath/search.py:13-26). Returns (ids, scores) — note the
        reference's search() returns (results, scores) in this order."""
        scores, ids = self.search(np.asarray(self._db), k + 1)
        return ids[:, 1:], scores[:, 1:]


def knn_search(
    haystack: np.ndarray,
    queries: np.ndarray,
    hits: int = DEFAULT_HITS,
    metric: str = "cosine",
    backend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Drop-in analogue of the reference's ``faiss_search``
    (reference: seqvec_search/main.py:22-50): returns (ids, scores, seconds).

    ``haystack`` may be a raw [N, d] array or a prebuilt index object with a
    compatible ``search`` method (FlatIndex / LSHIndex / GraphIndex).
    """
    start = time.time()
    if hasattr(haystack, "search"):
        index = haystack
    else:
        index = FlatIndex(metric=metric, backend=backend).add(haystack)
    scores, ids = index.search(np.asarray(queries), hits)
    return ids, scores, time.time() - start
