"""Distance primitives for the HBM-resident search engine.

Replaces the FAISS C++ distance computations (reference:
seqvec_search/main.py:31-45, cath/search.py:17-24) with MXU matmuls:
cosine/IP as X·Yᵀ over L2-normalised rows, squared L2 via the
‖x‖² + ‖y‖² − 2·x·yᵀ expansion so the FLOPs stay in one large matmul.

Conventions (FAISS-compatible):
  * "cosine"  — caller-visible scores are inner products of normalised rows,
    descending (the reference always pairs METRIC_INNER_PRODUCT with
    ``faiss.normalize_L2``).
  * "ip"      — raw inner product, descending.
  * "l2"      — *squared* L2 distance, ascending (FAISS IndexFlat L2 returns
    squared distances).
Internally everything is expressed as "bigger is better" similarities; "l2"
similarities are negated squared distances.
"""

import jax
import jax.numpy as jnp

METRICS = ("cosine", "ip", "l2")

# fp32 parity with FAISS requires true fp32 MXU accumulation — the "default"
# matmul precision truncates operands to bf16 (error ~1e-3, enough to swap
# near-tie neighbour ranks and break golden tests).
EXACT_PRECISION = jax.lax.Precision.HIGHEST


def pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad axis 0 up to a multiple (shared by every tiled engine)."""
    rem = (-x.shape[0]) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, rem), (0, 0)))


def l2_normalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Row-wise L2 normalisation. Matches faiss.normalize_L2: zero rows are
    left untouched (no NaNs)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    safe = jnp.where(norm > eps, norm, 1.0)
    return x / safe


def similarity_block(
    queries: jnp.ndarray,
    db_block: jnp.ndarray,
    metric: str,
    q_sq: jnp.ndarray = None,
) -> jnp.ndarray:
    """[Q, B] similarity of queries against one database block.

    For cosine the inputs must already be normalised (done once at index
    build / query prep, not per block). fp32 accumulation on the MXU.
    """
    dots = jnp.dot(
        queries,
        db_block.T,
        preferred_element_type=jnp.float32,
        precision=EXACT_PRECISION,
    )
    if metric in ("cosine", "ip"):
        return dots
    if metric == "l2":
        if q_sq is None:
            q_sq = jnp.sum(jnp.square(queries), axis=-1)
        d_sq = jnp.sum(jnp.square(db_block), axis=-1)
        # negated squared distance = similarity
        return 2.0 * dots - q_sq[:, None] - d_sq[None, :]
    raise ValueError(f"unknown metric {metric!r}")


def finalize_scores(sims: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Convert internal similarities back to FAISS-convention scores."""
    if metric == "l2":
        return -sims  # squared L2 distance, ascending order preserved
    return sims
