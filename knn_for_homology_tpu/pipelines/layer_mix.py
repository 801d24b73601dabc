"""SeqVec layer-mix sweep — barycentric weights over (CharCNN, LSTM1, LSTM2).

Parity with the reference (reference: cath/compare_seqvec_layer.py:44-64):
a grid of convex layer combinations, each searched all-vs-all and scored by
top-1 accuracy. The reference fans out over a 2-worker ProcessPoolExecutor;
here the whole sweep is one `lax.map` over the weight grid on device — each
step mixes the layers, L2-normalises, runs the fused top-2 self-search, and
reduces to an accuracy scalar, so nothing but the [W] accuracy vector ever
leaves the chip.
"""

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import l2_normalize
from ..ops.topk import oneshot_topk


def barycentric_grid(step: float = 0.1) -> np.ndarray:
    """[W, 3] weights with w0+w1+w2=1 on a simplex grid."""
    n = int(round(1.0 / step))
    weights = []
    for i in range(n + 1):
        for j in range(n + 1 - i):
            weights.append((i * step, j * step, 1.0 - (i + j) * step))
    return np.asarray(weights, dtype=np.float32)


@functools.partial(jax.jit, static_argnames=())
def _sweep(layers: jnp.ndarray, weights: jnp.ndarray, same_family: jnp.ndarray):
    """layers [3, N, d]; weights [W, 3]; same_family [N, N] bool.
    → accuracy [W]: fraction of queries whose top non-self hit shares the
    query's family."""
    n = layers.shape[1]

    def one(w):
        mixed = jnp.einsum("l,lnd->nd", w, layers)
        mixed = l2_normalize(mixed)
        _, ids = oneshot_topk(mixed, mixed, 2, metric="ip")
        # column 0 is the self hit (cosine 1.0); column 1 the real top hit
        top = ids[:, 1]
        correct = same_family[jnp.arange(n), top]
        return jnp.mean(correct.astype(jnp.float32))

    return jax.lax.map(one, weights)


def layer_mix_sweep(
    layer_embeddings: List[np.ndarray],
    families: np.ndarray,
    step: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (weights [W, 3], accuracy [W]). families: int codes per row."""
    layers = jnp.asarray(
        np.stack([np.asarray(e, dtype=np.float32) for e in layer_embeddings])
    )
    weights = jnp.asarray(barycentric_grid(step))
    fams = np.asarray(families)
    same = jnp.asarray(fams[:, None] == fams[None, :])
    acc = _sweep(layers, weights, same)
    return np.asarray(weights), np.asarray(acc)


def ternary_figure(weights: np.ndarray, acc: np.ndarray, figures_dir, name="layer-mix"):
    """Ternary-style scatter of the sweep (reference:
    cath/compare_seqvec_layer.py:106-125) + raw npz."""
    from ..eval.figures import _plt, endfig, save_raw

    save_raw(figures_dir, name + "-data", weights=weights, accuracy=acc)
    plt = _plt()
    # project the simplex onto 2-D
    x = weights[:, 1] + 0.5 * weights[:, 2]
    y = np.sqrt(3) / 2 * weights[:, 2]
    sc = plt.scatter(x, y, c=acc, s=120, cmap="viridis")
    plt.colorbar(sc, label="QrawTop1")
    for corner, label in [
        ((0, 0), "CharCNN"),
        ((1, 0), "LSTM1"),
        ((0.5, np.sqrt(3) / 2), "LSTM2"),
    ]:
        plt.annotate(label, corner)
    plt.axis("off")
    endfig(figures_dir, name)
