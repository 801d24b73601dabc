#!/usr/bin/env python3
"""Flat-vs-IVF crossover at n=2^22/d=1024 on ONE chip (VERDICT r4 #1).

The r4 finding: at every measured geometry the flat engine beat the
sub-linear indexes on raw q/s — but every measured geometry fit the fp32
rows in HBM. This campaign runs the regime the reference's UniRef90 case
study lives in (reference: more_sensitive/uniref90-figures/,
pfam/proteins_search.py:49): 4.19M ProtT5 vectors, d=1024, where

  * fp32 rows are 16 GB — they CANNOT be chip-resident; the lean
    streamed build (IVFIndex.add_chunks) makes the index anyway, and
  * the flat engine's per-query cost has doubled twice from n=2^20
    while IVF's per-query probe cost is ~n-independent.

Flat is measured in its own best mode for the memory class (int8 rows =
the only flat layout that fits: sq8-sym at the 0.95 class, sq8-sym2 at
the 0.99 class). Recall for everything is scored against a streamed
fp32-exact baseline (precision=HIGHEST) on a query subsample.

One JSON line per measurement; memory decomposition at the end.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_ivf import make_clustered_chunks  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2**22)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument(
        "--clusters", type=int, default=0,
        help="generator clusters (0 -> n/128: the tight-family regime)",
    )
    p.add_argument("--chunk", type=int, default=2**18)
    p.add_argument("--queries", type=int, default=65536)
    p.add_argument("--recall-sample", type=int, default=4096)
    p.add_argument("--ks", type=int, nargs="+", default=[10, 1000])
    p.add_argument(
        "--nprobe", type=int, nargs="+", default=[4, 8, 16, 32, 64],
    )
    p.add_argument("--kmeans-iters", type=int, default=16)
    p.add_argument(
        "--ivf-clusters", type=int, default=0,
        help="IVF cells (0 -> 1.25*n/128: fuller cells than the half-full"
        " auto default, so the slab table stays ~1.25x the int8 rows)",
    )
    p.add_argument("--qb", type=int, default=0)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip-flat", action="store_true")
    p.add_argument("--skip-union", action="store_true")
    p.add_argument("--skip-dma", action="store_true")
    p.add_argument("--dma-ratio", type=int, default=0)
    p.add_argument(
        "--query-mode", choices=["random", "family"], default="random",
        help="random: queries = the first db rows (no shared structure"
        " between consecutive queries — the worst case for probe"
        " sharing). family: queries drawn family-by-family from a few"
        " hundred generator clusters — the reference's production shape"
        " (pfam/proteins.py streams family-sorted embeddings), where a"
        " query block's probe union is a small fraction of the table",
    )
    p.add_argument("--families", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.exact_pallas import (
        SQ8Database, packed_pallas_topk,
    )
    from knn_for_homology_tpu.ops.graph_pallas import quantize_int8
    from knn_for_homology_tpu.search.ivf import (
        IVFIndex, _chunk_write, _route_prefs,
    )

    n, d = args.n, args.d
    gen_clusters = args.clusters or max(1, n // 128)
    ivf_c = args.ivf_clusters or -(-5 * n // (4 * 128))
    chunks = make_clustered_chunks(
        jax.random.PRNGKey(0), n, d, gen_clusters, args.chunk
    )
    assert args.chunk >= args.queries, "queries must fit the first chunk"
    if args.query_mode == "random":
        queries = next(iter(chunks()))[: args.queries]
    else:
        # family mode: fresh draws around `families` generator centers
        # (queries are NOT db rows; per-family counts equal). The
        # generator's centers are reproduced from the same key split that
        # make_clustered_chunks uses.
        from knn_for_homology_tpu.ops.distance import l2_normalize

        kc, kd = jax.random.split(jax.random.PRNGKey(0))
        centers = l2_normalize(
            jax.random.normal(kc, (gen_clusters, d), jnp.float32)
        )
        kf, kn = jax.random.split(jax.random.fold_in(kd, 1 << 20))
        fams = jax.random.choice(
            kf, gen_clusters, (args.families,), replace=False
        )
        per = args.queries // args.families
        assign = jnp.repeat(fams, per)[: args.queries]
        x = centers[assign] + (0.5 / np.sqrt(d)) * jax.random.normal(
            kn, (args.queries, d), jnp.float32
        )
        queries = l2_normalize(x)
        del centers
    queries = jax.block_until_ready(queries)
    k_max = max(args.ks)

    # ---- streamed fp32-exact baseline on the recall subsample ----
    sample = np.linspace(0, args.queries - 1, args.recall_sample).astype(int)
    sample_j = jnp.asarray(sample)
    q_sample = queries[sample_j]

    @jax.jit
    def chunk_scores_topk(qs, chunk):
        s = jnp.einsum(
            "qd,nd->qn", qs, chunk,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k_max)

    t0 = time.time()
    best_v = jnp.full((args.recall_sample, k_max), -np.inf, jnp.float32)
    best_i = jnp.full((args.recall_sample, k_max), -1, jnp.int32)
    off = 0
    for chunk in chunks():
        rows = int(chunk.shape[0])
        # query sub-blocks bound the [qs, chunk] transient to ~1 GB
        sub = max(1, (1 << 28) // (rows * 4))
        vs, is_ = [], []
        for s in range(0, args.recall_sample, sub):
            v, i = chunk_scores_topk(q_sample[s : s + sub], chunk)
            vs.append(v)
            is_.append(i + off)
        v = jnp.concatenate(vs)
        i = jnp.concatenate(is_)
        cat_v = jnp.concatenate([best_v, v], axis=1)
        cat_i = jnp.concatenate([best_i, i], axis=1)
        best_v, pos = jax.lax.top_k(cat_v, k_max)
        best_i = jnp.take_along_axis(cat_i, pos, axis=1)
        off += rows
    exact_ids = np.asarray(jax.block_until_ready(best_i))
    print(json.dumps({
        "case": "exact-baseline", "n": n, "k": k_max,
        "seconds": round(time.time() - t0, 1),
    }), flush=True)
    del best_v, best_i

    def recall_of(ids_full, k):
        ids = np.asarray(jnp.asarray(ids_full)[sample_j])
        return float(np.mean([
            len(set(a[:k].tolist()) & set(b[b >= 0][:k].tolist())) / k
            for a, b in zip(exact_ids, ids)
        ]))

    def timed(fn, tag, k, extra=None):
        ids = jax.block_until_ready(fn())  # compile + warm
        secs = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            ids = fn()
            jax.block_until_ready(ids)
            np.asarray(ids[:1, :1])  # force full sync (relay quirk)
            secs = min(secs, time.time() - t0)
        print(json.dumps({
            "case": tag, "n": n, "k": k,
            "qps": round(args.queries / secs, 1),
            "recall": round(recall_of(ids, k), 4),
            **(extra or {}),
        }), flush=True)

    # ---- flat packed engine, int8 rows (the only flat layout that fits
    # this n on one chip; fp32/bf16 flat would need 16/8 GB of rows) ----
    if not args.skip_flat:
        db_i8 = jnp.zeros((n, d), jnp.int8)
        scales = jnp.ones((n,), jnp.float32)
        t0 = time.time()
        start = 0
        for chunk in chunks():
            q8, s = quantize_int8(chunk)
            at = jnp.asarray(start, jnp.int32)
            db_i8 = _chunk_write(db_i8, q8, at)
            scales = _chunk_write(scales, s, at)
            start += int(chunk.shape[0])
        sq8 = SQ8Database(db_i8, scales, n)
        jax.block_until_ready(db_i8)
        print(json.dumps({
            "case": "flat-quantise", "seconds": round(time.time() - t0, 1),
        }), flush=True)
        for k in args.ks:
            timed(
                lambda k=k: packed_pallas_topk(sq8, queries, k, metric="ip")[1],
                "flat-sq8-sym", k,
            )
            timed(
                lambda k=k: packed_pallas_topk(
                    sq8, queries, k, metric="ip", storage="sq8-sym2",
                    recall_target=0.995,
                )[1],
                "flat-sq8-sym2-rt995", k,
            )
        del sq8, db_i8, scales

    # ---- lean IVF via the streamed build ----
    t0 = time.time()
    index = IVFIndex(
        metric="cosine", n_clusters=ivf_c, nprobe=args.nprobe[0],
        kmeans_iters=args.kmeans_iters, store_fp32=False,
    ).add_chunks(chunks, n_total=n)
    jax.block_until_ready(index._packed[0])
    build_s = time.time() - t0
    pv, pi, sc = index._packed
    print(json.dumps({
        "build_seconds": round(build_s, 1),
        "cells": int(index._centroids.shape[0]),
        "slab_gb": round(pv.size / 2**30, 2),
        "index_gb": round(
            (pv.size + pi.size * 4 + sc.size * 4
             + index._centroids.size * 4) / 2**30, 2,
        ),
    }), flush=True)
    if args.qb:
        index.QUERY_BLOCK = args.qb
    if args.dma_ratio:
        index.DMA_OVER_UNION_RATIO = args.dma_ratio

    top1 = np.asarray(
        _route_prefs(queries, index._centroids, "cosine", 1)[:, 0]
    )
    order = np.argsort(top1, kind="stable")
    inv = np.argsort(order)
    q_sorted = queries[jnp.asarray(order)]
    inv_j = jnp.asarray(inv)

    def sweep(tag):
        for k in args.ks:
            for nprobe in args.nprobe:
                index.nprobe = nprobe
                eff = index.plan_blocks(k)[1]
                if eff > nprobe and nprobe != args.nprobe[0]:
                    continue

                def run(k=k):
                    return index.search_device(q_sorted, k)[1][inv_j]

                timed(run, tag, k, {
                    "nprobe": eff, "qb": index.plan_blocks(k)[4],
                })

    if not args.skip_union:
        sweep("ivf-auto")
        # forced union scan: the auto heuristic prefers the DMA path on
        # low-locality query sets, but the sym2 union scan is the lean
        # layout's only ≥0.99-recall mode at k>rescore_max_k — measure it
        ratio = index.DMA_OVER_UNION_RATIO
        index.DMA_OVER_UNION_RATIO = 1 << 30
        sweep("ivf-union")
        index.DMA_OVER_UNION_RATIO = ratio
    if not args.skip_dma:
        index.UNION_MIN_Q = 1 << 30
        sweep("ivf-dma")


if __name__ == "__main__":
    main()
