#!/usr/bin/env python3
"""IVF sub-linearity head-to-head vs the flat engine at n >= 1M.

At n=131k the flat packed engine (394k q/s, compute-bound) beats IVF on
raw q/s — scanning everything at MXU rate outruns gather + sub-linear
scan at that size. The crossover argument for an IVF index is asymptotic:
flat work grows O(n) per query while IVF work grows with the probed
fraction. This script measures the crossover directly at n=2^20,
d=1024 — 8x the headline corpus, the regime the reference's UniRef90
case study lives in (reference: more_sensitive/uniref90-figures/) — on
one chip, big route-sorted query batches (the production shape: pipeline
searches stream family-ordered embeddings):

  * flat packed sq8-sym, database prequantised (the repeated-search
    production point of ops/exact_pallas.py), and
  * IVFIndex grouped union-scan (one dispatch per gather budget).

Recall for both is scored against the exact engine on a 4096-query
subsample. One JSON line per measurement.

Memory note (16 GB HBM): f32 db 4 GB + IVF slabs ~2.3 GB + sq8 copy
1 GB + queries/buffers — fits with room for the union gather transient;
the adversarial 2048-cluster generator from bench_ivf.py scales up
unchanged.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_ivf import make_clustered  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2**20)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--clusters", type=int, default=8192)
    p.add_argument("--queries", type=int, default=65536)
    p.add_argument("--recall-sample", type=int, default=4096)
    p.add_argument("--ks", type=int, nargs="+", default=[10, 1000])
    p.add_argument(
        "--nprobe", type=int, nargs="+", default=[4, 8, 16, 32, 64, 128],
        help="frontier sweep; per-k the engine floors nprobe at 2k/128",
    )
    p.add_argument("--kmeans-iters", type=int, default=16)
    p.add_argument("--qb", type=int, default=0, help="IVF query block override")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip-flat", action="store_true")
    p.add_argument("--skip-union", action="store_true")
    p.add_argument("--skip-dma", action="store_true")
    p.add_argument(
        "--store-fp32", action="store_true",
        help="keep fp32 rows for exact rescoring (the high-recall mode;"
        " default is the lean int8-slab layout)",
    )
    p.add_argument("--rescore-max-k", type=int, default=None)
    p.add_argument("--shortlist-mult", type=float, default=4.0)
    p.add_argument(
        "--dma-ratio", type=int, default=0,
        help="override IVFIndex.DMA_OVER_UNION_RATIO (e.g. a huge value"
        " forces the union scan; 0 keeps the class default)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.exact_pallas import (
        exact_pallas_topk, packed_pallas_topk, quantize_database,
    )
    from knn_for_homology_tpu.search.ivf import IVFIndex, _route_prefs

    db = make_clustered(jax.random.PRNGKey(0), args.n, args.d, args.clusters)
    queries = db[: args.queries]
    k_max = max(args.ks)

    # exact reference on a subsample (the exact engine is O(n) per query;
    # 4096 queries keep the baseline pass short). ONE k=k_max pass serves
    # every k: exact ids are sorted, so exact top-k = its first k columns.
    sample = np.linspace(0, args.queries - 1, args.recall_sample).astype(int)
    q_sample = queries[jnp.asarray(sample)]
    _, exact_ids = exact_pallas_topk(db, q_sample, k_max, metric="ip")
    exact_ids = np.asarray(jax.block_until_ready(exact_ids))

    sample_j = jnp.asarray(sample)

    def recall_of(ids_full, k):
        # subsample ON DEVICE: fetching the whole [65k, 1000] id table
        # through the ~3 MB/s tunnel costs ~90 s per measurement
        ids = np.asarray(jnp.asarray(ids_full)[sample_j])
        return float(np.mean([
            len(set(a[:k].tolist()) & set(b[b >= 0][:k].tolist())) / k
            for a, b in zip(exact_ids, ids)
        ]))

    def timed(fn, tag, k, extra=None):
        ids = jax.block_until_ready(fn())  # compile + warm
        secs = float("inf")
        for _ in range(args.reps):  # best-of: relay noise only ADDS time
            t0 = time.time()
            ids = fn()
            jax.block_until_ready(ids)
            np.asarray(ids[:1, :1])  # force full sync (relay quirk)
            secs = min(secs, time.time() - t0)
        print(json.dumps({
            "case": tag,
            "n": args.n,
            "k": k,
            "qps": round(args.queries / secs, 1),
            "recall": round(recall_of(ids, k), 4),
            **(extra or {}),
        }), flush=True)

    # ---- flat packed sq8-sym, prequantised (the production point) ----
    sq8 = quantize_database(db)

    if not args.skip_flat:
        for k in args.ks:
            timed(
                lambda k=k: packed_pallas_topk(sq8, queries, k, metric="ip")[1],
                "flat-sq8-sym", k,
            )
            # the flat engine's high-recall operating point (two-level
            # query quantisation, VERDICT r4 #4) — the 0.99-class line the
            # IVF frontier must be judged against
            timed(
                lambda k=k: packed_pallas_topk(
                    sq8, queries, k, metric="ip", storage="sq8-sym2",
                    recall_target=0.995,
                )[1],
                "flat-sq8-sym2-rt995", k,
            )

    # ---- IVF grouped union-scan (lean layout: int8 slabs only — the
    # production memory point, and it frees 4 GB of HBM for the scan) ----
    del sq8  # free the flat engine's int8 copy before the build transient
    t0 = time.time()
    index = IVFIndex(
        metric="cosine", nprobe=args.nprobe[0],
        kmeans_iters=args.kmeans_iters, store_fp32=args.store_fp32,
        rescore_max_k=args.rescore_max_k,
        shortlist_mult=args.shortlist_mult,
    ).add(db)
    build_s = time.time() - t0
    print(json.dumps({
        "build_seconds": round(build_s, 1),
        "cells": int(index._centroids.shape[0]),
    }), flush=True)
    # the generator's db is no longer needed (the index holds its own
    # copy when store_fp32): freeing 4 GB of HBM keeps the fp32-rescore
    # transients from OOMing at n=2^20/d=1024
    del db
    if args.qb:
        index.QUERY_BLOCK = args.qb
    if args.dma_ratio:
        index.DMA_OVER_UNION_RATIO = args.dma_ratio

    # route-locality sort once, outside the timed region: production
    # callers search family-ordered corpora (and IVFIndex re-sorts
    # internally anyway; pre-sorting makes the timing represent the
    # locality the internal argsort would find)
    top1 = np.asarray(
        _route_prefs(queries, index._centroids, "cosine", 1)[:, 0]
    )
    order = np.argsort(top1, kind="stable")
    inv = np.argsort(order)
    q_sorted = queries[jnp.asarray(order)]
    inv_j = jnp.asarray(inv)

    for k in (() if args.skip_union else args.ks):
        for nprobe in args.nprobe:
            index.nprobe = nprobe
            eff_nprobe = index.plan_blocks(k)[1]
            if eff_nprobe > nprobe and nprobe != args.nprobe[0]:
                continue  # floored to the same point already measured

            def ivf_run(k=k):
                return index.search_device(q_sorted, k)[1][inv_j]

            # plan_blocks returns the EFFECTIVE query block (the rescore
            # transient cap can halve QUERY_BLOCK) — report what ran
            timed(ivf_run, "ivf-union", k, {
                "nprobe": eff_nprobe, "qb": index.plan_blocks(k)[4],
            })

    # ---- IVF per-query DMA path (beam_expand slabs) ----
    # The union scan makes every query pay MXU compute over the BLOCK's
    # whole cell union — on query sets with little probe sharing (this
    # generator's clusters are unrelated) that union covers 25-50% of the
    # database. The DMA path streams only each query's own nprobe slabs
    # (nprobe*128 rows ≈ 0.2-1.6% of the db) and scores the dequantised
    # int8 rows in f32 — one-sided storage noise only, so its recall
    # ceiling also sits ABOVE the double-int8 union scan's.
    index.UNION_MIN_Q = 1 << 30  # force the per-probe DMA path
    for k in (() if args.skip_dma else args.ks):
        for nprobe in args.nprobe:
            index.nprobe = nprobe
            eff_nprobe = index.plan_blocks(k)[1]
            if eff_nprobe > nprobe and nprobe != args.nprobe[0]:
                continue

            def dma_run(k=k):
                return index.search_device(q_sorted, k)[1][inv_j]

            timed(dma_run, "ivf-dma", k, {
                "nprobe": eff_nprobe, "qb": index.plan_blocks(k)[4],
            })


if __name__ == "__main__":
    main()
