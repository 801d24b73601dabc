#!/usr/bin/env python3
"""Quantify IVF capacity-balancer spill at n=2^20 (TPU).

debug_ivf_dma_1m.py showed probe-coverage@10 = 0.21 at nprobe=16: most
true neighbours live in cells their query never routes to. Hypothesis:
rows that miss all `prefs` ranked cells get spilled to ARBITRARY free
slots (_balanced_members' global-free-slot fallback), which destroys
per-query probe locality on tight-cluster data. This measures, for each
row, the preference rank of the cell it actually landed in. One JSON
line per histogram bucket set.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_ivf import make_clustered  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.search.ivf import IVFIndex, _route_prefs

    n, d, clusters = 2**20, 1024, 8192
    db = make_clustered(jax.random.PRNGKey(0), n, d, clusters)
    index = IVFIndex(
        metric="cosine", nprobe=16, kmeans_iters=16, store_fp32=False,
    ).add(db)
    print(json.dumps({"stage": "built"}), flush=True)

    # rank of the landing cell within each row's top-16 routed preferences
    prefs16 = _route_prefs(db, index._centroids, "cosine", 16)  # [N, 16]
    members = jnp.asarray(index._members)  # [C, 128]
    c = members.shape[0]
    flat = members.reshape(-1)
    cell_of_slot = (
        jnp.arange(flat.shape[0], dtype=jnp.int32) // 128
    )
    landed = jnp.zeros((n,), jnp.int32).at[
        jnp.where(flat >= 0, flat, n - 1)
    ].set(jnp.where(flat >= 0, cell_of_slot, 0))
    match = prefs16 == landed[:, None]  # [N, 16]
    rank = jnp.where(
        jnp.any(match, axis=1), jnp.argmax(match, axis=1), 16
    )
    hist = np.asarray(jnp.bincount(rank, length=17))
    # cell fill distribution
    fill = np.asarray(jnp.sum(members >= 0, axis=1))
    print(json.dumps({
        "rank_hist_frac": [round(float(h) / n, 4) for h in hist],
        "beyond_top16_frac": round(float(hist[16]) / n, 4),
        "cells": int(c),
        "fill_mean": round(float(fill.mean()), 1),
        "fill_p50": int(np.percentile(fill, 50)),
        "fill_p90": int(np.percentile(fill, 90)),
        "fill_full_frac": round(float((fill == 128).mean()), 4),
        "fill_empty_frac": round(float((fill == 0).mean()), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
