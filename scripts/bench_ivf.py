#!/usr/bin/env python3
"""IVF index benchmark at the judged HNSW-parity operating points
(VERDICT r2 #3): n=131072, d=1024 clustered data (the graph benchmarks'
hard case), measuring

  * small-k: recall@10 vs exact + device query rate (criterion:
    >= 0.95 recall at >= 8k q/s, equal memory), and
  * large-k: k=1000 recall@1000 vs exact + query rate (criterion:
    >= 2k q/s at recall >= 0.9; CPU FAISS HNSW anchor ~1.17k q/s).

Also prints the index memory decomposition vs the FAISS HNSW footprint
(fp32 vectors + M=42 int32 links ~ 0.56 GB at this scale).

One JSON line per measurement.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--clusters", type=int, default=2048, help="true data clusters")
    p.add_argument("--queries", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--nprobe-large", type=int, default=32)
    p.add_argument("--n-clusters", type=int, default=0, help="IVF cells (0=auto)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.topk import flat_topk
    from knn_for_homology_tpu.search.ivf import CAPACITY, IVFIndex

    # clustered data generated on device (same recipe as sweep_graph.py:
    # tight near-orthogonal islands — the hard case for beam traversal)
    key = jax.random.PRNGKey(0)
    kc, kn, ka = jax.random.split(key, 3)
    centers = l2_normalize(
        jax.random.normal(kc, (args.clusters, args.d), jnp.float32)
    )
    assign = jax.random.randint(ka, (args.n,), 0, args.clusters)
    x = centers[assign] + 0.15 * jax.random.normal(
        kn, (args.n, args.d), jnp.float32
    )
    db = l2_normalize(x)
    jax.block_until_ready(db)
    queries = db[: args.queries]

    t0 = time.time()
    index = IVFIndex(
        metric="cosine", nprobe=args.nprobe, n_clusters=args.n_clusters
    ).add(db)
    build_s = time.time() - t0

    c = index._centroids.shape[0]
    mem = {
        "int8_slabs_mb": round(c * CAPACITY * args.d / 2**20, 1),
        "scales_ids_mb": round(2 * c * CAPACITY * 4 / 2**20, 1),
        "centroids_mb": round(c * args.d * 4 / 2**20, 1),
        "faiss_hnsw_mb": round((args.n * args.d * 4 + args.n * 42 * 4) / 2**20, 1),
    }
    print(json.dumps({"build_seconds": round(build_s, 1), "cells": c, **mem}),
          flush=True)

    _, exact10 = flat_topk(db, queries, 10, metric="ip")
    exact10 = np.asarray(exact10)
    _, exact1k = flat_topk(db, queries, 1000, metric="ip")
    exact1k = np.asarray(exact1k)

    def measure(k, exact_ids, nprobe):
        index.nprobe = nprobe
        index.search_device(queries, k)  # compile+warm
        t0 = time.time()
        s, i = index.search_device(queries, k)
        jax.block_until_ready(i)
        np.asarray(i[:1, :1])  # force full sync (relay quirk)
        secs = time.time() - t0
        i = np.asarray(i)
        rec = float(np.mean([
            len(set(a.tolist()) & set(b[b >= 0].tolist())) / k
            for a, b in zip(exact_ids, i)
        ]))
        return {
            "k": k,
            "nprobe": nprobe,
            "qps": round(args.queries / secs, 1),
            "recall": round(rec, 4),
        }

    for k, exact_ids, nprobe in (
        (10, exact10, args.nprobe),
        (1000, exact1k, args.nprobe_large),
        (1000, exact1k, 64),
    ):
        print(json.dumps(measure(k, exact_ids, nprobe)), flush=True)


if __name__ == "__main__":
    main()
