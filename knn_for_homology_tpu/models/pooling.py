"""Per-protein / per-domain pooling of per-residue embeddings.

Reference semantics:
  * mean over the residue axis = reduce_per_protein
    (reference: cath/embed.py:91-94, pfam/embed_t5_fp16.py:47)
  * per-residue L2-normalisation *before* pooling — the "L2" ProtT5 variant
    (reference: pfam/embed_t5_l2.py:69-71)
  * per-domain pooling of a slice [start-1:stop] of the residue axis
    (reference: pfam/embed_pfam_seqvec.py:29-40; 1-based inclusive ranges)
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mean_pool(per_residue: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L, d], mask [B, L] → [B, d] mean over real residues (fp32)."""
    m = mask.astype(jnp.float32)[..., None]
    total = jnp.sum(per_residue.astype(jnp.float32) * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return total / count


def l2_then_mean_pool(per_residue: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """L2-normalise each residue vector, then mean-pool (the L2 variant)."""
    x = per_residue.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    x = x / jnp.where(norm > 0, norm, 1.0)
    return mean_pool(x, mask)


def pool_domain_range(
    per_residue: np.ndarray, start: int, stop: int
) -> np.ndarray:
    """Mean over the 1-based inclusive residue range [start, stop]
    (reference: pfam/embed_pfam_seqvec.py:29-40 uses embedding[start-1:stop])."""
    return np.asarray(per_residue)[start - 1 : stop].mean(axis=0)


def pool_domains(
    per_residue: np.ndarray, ranges: Sequence[Tuple[int, int]]
) -> np.ndarray:
    """[n_domains, d] pooled domain vectors from one protein's residues."""
    return np.stack([pool_domain_range(per_residue, s, e) for s, e in ranges])


mean_pool_jit = jax.jit(mean_pool)
l2_then_mean_pool_jit = jax.jit(l2_then_mean_pool)
