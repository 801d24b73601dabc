#!/usr/bin/env python3
"""IVF index benchmark at the judged HNSW-parity operating points
(VERDICT r2 #3): n=131072, d=1024, measuring

  * small-k: recall@10 vs exact + device query rate on the 2048-cluster
    adversarial set (criterion: >= 0.95 recall at >= 8k q/s, equal
    memory), with both random-order and locality-sorted query blocks
    (sorted blocks probe fewer distinct cells -> the union-scan's
    sub-linear regime), and
  * large-k: k=1000 recall@1000 + query rate on a 128-cluster set where
    depth-1000 neighbourhoods are real structure, not noise ties
    (criterion: >= 2k q/s at recall >= 0.9; CPU FAISS HNSW anchor
    ~1.17k q/s).

Also prints the index memory decomposition vs the FAISS HNSW footprint
(fp32 vectors + M=42 int32 links ~ 0.56 GB at this scale).

One JSON line per measurement.
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_clustered(key, n, d, clusters, noise=0.5):
    """Clustered unit vectors: `noise` is the expected noise NORM relative
    to the unit-norm center (dimension-normalized: the per-coordinate std
    is noise/sqrt(d)), so within-cluster cosine ≈ 1/(1+noise²) ≈ 0.8 at
    the 0.5 default — the tight-family regime protein embeddings live in.

    The r3 version scaled noise per COORDINATE (norm 0.15·√d ≈ 4.8 at
    d=1024 — 5× the center): the "clusters" were noise-dominated, true
    top-k neighbours were random noise peaks spread uniformly over all
    cells, and NO routed index could recall them without scanning most of
    the database (measured: per-query probe coverage@10 was 0.21 while
    every row sat in its nearest cell — scripts/debug_ivf_spill.py). The
    r3 IVF numbers measured on that generator say nothing about routed
    search; r4 re-measured everything on this one."""
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.distance import l2_normalize

    kc, kn, ka = jax.random.split(key, 3)
    centers = l2_normalize(jax.random.normal(kc, (clusters, d), jnp.float32))
    assign = jax.random.randint(ka, (n,), 0, clusters)
    x = centers[assign] + (noise / np.sqrt(d)) * jax.random.normal(
        kn, (n, d), jnp.float32
    )
    db = l2_normalize(x)
    jax.block_until_ready(db)
    return db


def make_clustered_chunks(key, n, d, clusters, chunk, noise=0.5):
    """Chunked twin of make_clustered for corpora whose fp32 rows exceed
    HBM (n=2^22 x d=1024 fp32 = 16 GB): returns a zero-arg callable
    yielding [chunk, d] device arrays — the IVFIndex.add_chunks contract.
    Chunk i is generated from fold_in(key, i), so every invocation
    yields identical data (the streamed build passes over it twice and
    the benchmark regenerates queries/baseline slices)."""
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.distance import l2_normalize

    kc, kd = jax.random.split(key)
    centers = l2_normalize(jax.random.normal(kc, (clusters, d), jnp.float32))

    @functools.partial(jax.jit, static_argnames=("rows",))
    def one(i, rows):
        ka, kn = jax.random.split(jax.random.fold_in(kd, i))
        assign = jax.random.randint(ka, (rows,), 0, clusters)
        x = centers[assign] + (noise / np.sqrt(d)) * jax.random.normal(
            kn, (rows, d), jnp.float32
        )
        return l2_normalize(x)

    def chunks():
        for i, s in enumerate(range(0, n, chunk)):
            yield one(i, min(chunk, n - s))

    return chunks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--queries", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--nprobe-large", type=int, default=32)
    p.add_argument("--kmeans-iters", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.topk import flat_topk
    from knn_for_homology_tpu.search.ivf import CAPACITY, IVFIndex

    def measure(index, db, queries, k, exact_ids, nprobe, tag, reps=3):
        index.nprobe = nprobe
        index.search_device(queries, k)  # compile+warm
        secs = float("inf")
        for _ in range(reps):  # best-of: relay noise only ADDS time
            t0 = time.time()
            s, i = index.search_device(queries, k)
            jax.block_until_ready(i)
            np.asarray(i[:1, :1])  # force full sync (relay quirk)
            secs = min(secs, time.time() - t0)
        i = np.asarray(i)
        rec = float(np.mean([
            len(set(a.tolist()) & set(b[b >= 0].tolist())) / k
            for a, b in zip(exact_ids, i)
        ]))
        print(json.dumps({
            "case": tag,
            "k": k,
            "nprobe": nprobe,
            "qps": round(queries.shape[0] / secs, 1),
            "recall": round(rec, 4),
        }), flush=True)

    # ---- small-k on the adversarial 2048-cluster set ----
    db = make_clustered(jax.random.PRNGKey(0), args.n, args.d, 2048)
    queries = db[: args.queries]

    t0 = time.time()
    index = IVFIndex(
        metric="cosine", nprobe=args.nprobe,
        kmeans_iters=args.kmeans_iters,
    ).add(db)
    build_s = time.time() - t0

    c = index._centroids.shape[0]
    mem = {
        "int8_slabs_mb": round(c * CAPACITY * args.d / 2**20, 1),
        "scales_ids_mb": round(2 * c * CAPACITY * 4 / 2**20, 1),
        "centroids_mb": round(c * args.d * 4 / 2**20, 1),
        "faiss_hnsw_mb": round(
            (args.n * args.d * 4 + args.n * 42 * 4) / 2**20, 1
        ),
    }
    print(json.dumps(
        {"build_seconds": round(build_s, 1), "cells": c, **mem}
    ), flush=True)

    _, exact10 = flat_topk(db, queries, 10, metric="ip")
    exact10 = np.asarray(exact10)
    measure(index, db, queries, 10, exact10, args.nprobe, "small-k")

    # locality-sorted block: queries grouped by their routed cell (real
    # pipelines process family-/cluster-ordered embeddings) — the union
    # shrinks and the scan goes sub-linear
    from knn_for_homology_tpu.search.ivf import _route_sims

    top1 = np.asarray(
        jnp.argmax(_route_sims(queries, index._centroids, "cosine"), axis=1)
    )
    order = np.argsort(top1, kind="stable")
    q_sorted = queries[jnp.asarray(order)]
    measure(
        index, db, q_sorted, 10, exact10[order], args.nprobe,
        "small-k-sorted",
    )

    del index

    # ---- large-k on a 128-cluster set (≈1k-member families) ----
    db_lk = make_clustered(jax.random.PRNGKey(7), args.n, args.d, 128)
    q_lk = db_lk[: args.queries]
    index_lk = IVFIndex(
        metric="cosine", nprobe=args.nprobe_large,
        kmeans_iters=args.kmeans_iters,
    ).add(db_lk)
    _, exact1k = flat_topk(db_lk, q_lk, 1000, metric="ip")
    exact1k = np.asarray(exact1k)
    for nprobe in (args.nprobe_large, 64):
        measure(index_lk, db_lk, q_lk, 1000, exact1k, nprobe, "large-k")


if __name__ == "__main__":
    main()
