#!/usr/bin/env python3
"""Attribute the IVF union-scan's per-block time at the high-recall
operating point (n=2^20/d=1024, nprobe=256, shortlist 1500, qb=256,
budget 2048 cells -> 262144 scanned rows/block).

Measured end-to-end: 5.57k q/s = ~46 ms per 256-query block, while the
flat packed engine scores the same MAC count per block in ~1.3 ms — the
union scan is far off the flat engine's rate per scanned row. The
rescore pass was already ruled out (the union-matmul rescore variant
measured a wash, see benchmarks/r4_campaigns.md). This decomposes one
block into its pieces, chained-rep timed in one jit (the only honest
timing through the relay). Big arrays ride as jit ARGUMENTS — a
closed-over pv/db becomes a multi-GB HLO constant and blows the compile
relay's request limit (CLAUDE.md).

  route        — [qb, C] routing matmul + top_k(nprobe)
  probed_topk  — probe-count scatter + top_k(budget) over C cells
  gather8      — _gather_int8_buffer at budget cells (the int8 stream)
  scan         — packed_pallas_topk over the gathered buffer at the
                 operating point's (s=1500, recall_target=0.995)
  scan_k1000   — same buffer at the flat bench's (k=1000, rt=0.98)
  full         — _union_scan_one, rescore=False
  full_rescore — _union_scan_one, rescore="db"

One JSON line per piece. Run on the TPU in the background.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

C, LANE, D = 16384, 128, 1024
QB, NPROBE, SHORTLIST, BUDGET = 256, 256, 1500, 2048


def main():
    global QB, BUDGET
    global NPROBE, SHORTLIST
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=BUDGET)
    ap.add_argument("--qb", type=int, default=QB)
    ap.add_argument("--nprobe", type=int, default=NPROBE)
    ap.add_argument("--shortlist", type=int, default=SHORTLIST)
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="subset of piece names to measure",
    )
    args = ap.parse_args()
    QB, BUDGET = args.qb, args.budget
    NPROBE, SHORTLIST = args.nprobe, args.shortlist
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.exact_pallas import (
        SQ8Database, packed_pallas_topk,
    )
    from knn_for_homology_tpu.search import ivf as im

    key = jax.random.PRNGKey(0)
    kc, kp, kq, ks = jax.random.split(key, 4)
    centroids = l2_normalize(jax.random.normal(kc, (C, D), jnp.float32))
    pv = jax.random.randint(kp, (C * LANE, D), -127, 128, jnp.int8)
    pi = jax.random.permutation(kp, C * LANE).astype(jnp.int32).reshape(
        C, LANE
    )
    sc = jnp.full((C, LANE), 0.01, jnp.float32)
    row_sq = jnp.zeros((0, LANE), jnp.float32)
    slot = jnp.zeros((0,), jnp.int32)
    db = l2_normalize(jax.random.normal(ks, (C * LANE // 2, D), jnp.float32))
    db0 = jnp.zeros((0, D), jnp.float32)
    q = l2_normalize(jax.random.normal(kq, (QB, D), jnp.float32))
    cells_sel = jax.random.permutation(kc, C)[:BUDGET].astype(jnp.int32)
    jax.block_until_ready((centroids, pv, pi, db, q, cells_sel))
    print("data ready", flush=True)

    zeros = jnp.zeros((QB, 127), jnp.float32)
    q_bias = jnp.max(jnp.abs(q), axis=1, keepdims=True)
    q_aug = jnp.concatenate([q, q_bias, zeros], axis=1)
    buf8, b_scales, gids = jax.block_until_ready(
        im._gather_int8_buffer(pv, pi, sc, cells_sel)
    )

    def route(x, cents):
        r = im._route_sims(x, cents, "cosine")
        return jax.lax.top_k(r, NPROBE)[1]

    def route_approx(x, cents):
        # PartialReduce top-k: the TPU-native approximate selection —
        # candidate replacement for the routing top_k (probe sets only
        # need to be good, not exact)
        r = im._route_sims(x, cents, "cosine")
        return jax.lax.approx_max_k(r, NPROBE)[1]

    sel0 = jax.block_until_ready(jax.jit(route)(q, centroids))

    def probed_topk(sel):
        probed = jnp.zeros((C,), jnp.int32).at[sel.reshape(-1)].add(1)
        return jax.lax.top_k(probed, BUDGET)[1]

    def gather8(cs, pv, pi, sc):
        return im._gather_int8_buffer(pv, pi, sc, cs)[0]

    def scan(x, buf8, b_scales):
        return packed_pallas_topk(
            SQ8Database(buf8, b_scales, buf8.shape[0]), x, SHORTLIST,
            metric="ip", recall_target=0.995,
        )[1]

    def scan_k1000(x, buf8, b_scales):
        return packed_pallas_topk(
            SQ8Database(buf8, b_scales, buf8.shape[0]), x, 1000,
            metric="ip", recall_target=0.98,
        )[1]

    def full(x, cents, pv, pi, sc, db, rescore):
        return im._union_scan_one(
            x, cents, pv, pi, sc, row_sq, db, slot,
            metric="cosine", k_eff=1000, nprobe=NPROBE,
            shortlist=SHORTLIST, rescore=rescore, budget=BUDGET,
            int8_min_rows=im.IVFIndex.INT8_UNION_MIN_ROWS,
        )[1]

    from knn_for_homology_tpu.ops.ivf_pallas import ivf_union_topk

    def indirect_scan(x, pv, pi, sc, cs):
        # the r5 gather-free path at the operating point (quantisation of
        # x happens inside, matching the production call)
        return ivf_union_topk(pv, sc, pi, cs, x, SHORTLIST)[1]

    def indirect_scan_k1000(x, pv, pi, sc, cs):
        return ivf_union_topk(
            pv, sc, pi, cs, x, 1000, recall_target=0.98
        )[1]

    def indirect_sym2_k1000(x, pv, pi, sc, cs):
        # the r5 lean high-recall operating point (no rescore pass)
        return ivf_union_topk(
            pv, sc, pi, cs, x, 1000, recall_target=0.995, compute="sym2",
        )[1]

    def flat_sym2_k1000(x, pv, b_scales):
        # efficiency ceiling for the full-table budget: the flat packed
        # sym2 kernel streaming the SAME slab matrix without indirection
        return packed_pallas_topk(
            SQ8Database(pv, b_scales, pv.shape[0]), x, 1000,
            metric="ip", recall_target=0.995, storage="sq8-sym2",
        )[1]

    def block_counts(x, cents):
        return im._block_union_counts(
            x.reshape(1, QB, D), cents, "cosine", NPROBE,
            route_approx=True,
        )[0]

    def top1_sort(x, cents):
        top1 = im._route_prefs(x, cents, "cosine", 1)
        return jnp.argsort(top1[:, 0])

    variants = {
        "route": (route, q, (centroids,)),
        "route_approx": (route_approx, q, (centroids,)),
        "probed_topk": (probed_topk, sel0, ()),
        "gather8": (gather8, cells_sel, (pv, pi, sc)),
        "scan": (scan, q_aug, (buf8, b_scales)),
        "scan_k1000": (scan_k1000, q_aug, (buf8, b_scales)),
        "indirect_scan": (indirect_scan, q, (pv, pi, sc, cells_sel)),
        "indirect_scan_k1000": (
            indirect_scan_k1000, q, (pv, pi, sc, cells_sel)
        ),
        "indirect_sym2_k1000": (
            indirect_sym2_k1000, q, (pv, pi, sc, cells_sel)
        ),
        "flat_sym2_k1000": (
            flat_sym2_k1000, q, (pv, sc.reshape(-1))
        ),
        "block_counts": (block_counts, q, (centroids,)),
        "top1_sort": (top1_sort, q, (centroids,)),
        "full": (
            lambda x, *a: full(x, *a, db0, False), q,
            (centroids, pv, pi, sc),
        ),
        "full_rescore": (
            lambda x, *a: full(x, *a, "db"), q,
            (centroids, pv, pi, sc, db),
        ),
    }

    def chained(fn, reps):
        def f(x, *consts):
            acc = jnp.int32(0)
            for _ in range(reps):
                out = fn(x, *consts)
                acc = acc + out.reshape(-1)[0].astype(jnp.int32)
                x, acc = jax.lax.optimization_barrier((x, acc))
            return acc
        return jax.jit(f)

    for name, (fn, x, consts) in variants.items():
        f_lo, f_hi = chained(fn, 1), chained(fn, 3)
        for f in (f_lo, f_hi):
            jax.block_until_ready(f(x, *consts))

        def fetch_time(f):
            t0 = time.perf_counter()
            for _ in range(3):
                float(f(x, *consts))
            return (time.perf_counter() - t0) / 3

        t = (fetch_time(f_hi) - fetch_time(f_lo)) / 2
        print(json.dumps({
            "piece": name,
            "ms_per_block": round(t * 1e3, 2),
            "qps_extrapolated": round(QB / max(t, 1e-9), 0),
        }), flush=True)


if __name__ == "__main__":
    main()
