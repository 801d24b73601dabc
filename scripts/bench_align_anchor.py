#!/usr/bin/env python3
"""Full-protein rescoring anchor: kNN-prefilter alignment at the
reference's scale vs the MMseqs2 CPU align step.

The reference aligned its full-protein prefilter output in 5m37s = 337 s
on CPU (reference: pfam/proteins.py:140-141, order 10^7 pairs). This
measures the native TPU pass at that workload: Q queries × K hits each,
lengths drawn from a lognormal protein-length mix (median ~330 aa,
clipped [50, 2048]) — the honest number includes all padding waste from
the (Lq, Lt) bucket grid and partially-filled rows.

Codes are GENERATED ON DEVICE per call shape (the axon host↔device
tunnel is ~3 MB/s; shipping 10^7 encoded pairs would swamp the
measurement — a production host feeds codes over PCIe instead). Padding
masks ride a tiny per-call lengths array. Two passes: the first pays the
per-shape compiles (persistent-cached), the second is the steady-state
number. One JSON line each.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GRIDS = {
    # coarse: the r4 first-measurement grid (pad_factor 2.1 on the
    # full-protein mix, warm 207.4 s = 1.62x the mmseqs anchor)
    "coarse": [128, 256, 384, 512, 640, 768, 1024, 1536, 2048],
    # fine: 64-aa steps to 1024 — with the Pallas kernel's ~1.5 s
    # per-shape compile, trading ~2x the cell count for less length
    # padding is nearly free
    "fine": list(range(64, 1025, 64)) + [1280, 1536, 2048],
}
BUCKETS = GRIDS["coarse"]


def bucket_up(x):
    for b in BUCKETS:
        if x <= b:
            return b
    return BUCKETS[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--queries", type=int, default=32768)
    p.add_argument("--hits", type=int, default=305)
    p.add_argument("--k-lanes", type=int, default=128)
    p.add_argument("--g-block", type=int, default=256)
    p.add_argument("--median-len", type=float, default=330.0)
    p.add_argument("--sigma", type=float, default=0.55)
    p.add_argument("--scan-chunk", type=int, default=128)
    p.add_argument("--anchor-s", type=float, default=337.0)
    p.add_argument("--bucket-grid", choices=sorted(GRIDS), default="coarse")
    p.add_argument("--workload-only", action="store_true",
                   help="print the packing stats and exit (no device work"
                        " — grid tuning runs host-side)")
    args = p.parse_args()
    BUCKETS[:] = GRIDS[args.bucket_grid]

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.align import sw_scores_grouped
    from knn_for_homology_tpu.ops.align_pallas import (
        MAX_LT_K_HBM,
        sw_scores_grouped_pallas,
    )
    from knn_for_homology_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.RandomState(0)

    def lengths(size):
        raw = rng.lognormal(np.log(args.median_len), args.sigma, size)
        return np.clip(raw, 50, 2048).astype(np.int32)

    # a CORPUS of proteins, each querying `hits` others — the all-vs-all
    # kNN-rescoring shape. Pairs flip so the ROW side is the longer
    # sequence and group by row-side identity (ops/align.align_hits's
    # packing): the lane axis is then the pair's MIN length, which kills
    # the max-length row contamination (pad factor 3.79 → ~2.05) and
    # keeps nearly every cell inside the Pallas kernel's VMEM budget.
    corpus = lengths(args.queries)
    groups = {}
    true_cells = 0.0
    for qi in range(args.queries):
        hit_ids = rng.randint(0, args.queries, args.hits)
        lq = int(corpus[qi])
        for h in hit_ids:
            lt = int(corpus[h])
            true_cells += lq * lt
            row, lane = (h, lq) if lt > lq else (qi, lt)
            groups.setdefault(int(row), []).append(lane)

    rows = []  # (lq_bucket, lt_bucket, row_len, [lane lengths])
    for rid, lanes in groups.items():
        lanes.sort()
        lq_b = bucket_up(corpus[rid])
        for start in range(0, len(lanes), args.k_lanes):
            chunk = np.asarray(lanes[start : start + args.k_lanes])
            rows.append((lq_b, bucket_up(chunk[-1]), corpus[rid], chunk))

    # cells on the bucket grid; merge TINY cells upward in Lt so
    # stragglers don't each cost a compile (threshold 32 rows — the old
    # g_block threshold promoted most of the tail to Lt=2048 and
    # measured pad_factor 4.08)
    cells = {}
    for r in rows:
        cells.setdefault((r[0], r[1]), []).append(r)
    for key in sorted(cells):
        if len(cells[key]) >= 32 or key[1] == BUCKETS[-1]:
            continue
        nxt = (key[0], BUCKETS[min(BUCKETS.index(key[1]) + 1,
                                   len(BUCKETS) - 1)])
        cells.setdefault(nxt, []).extend(cells.pop(key))

    def chunks_of(lq, rs):
        # free-form grid: chunk by the SMEM query-code budget, tail
        # rounded to a power of two (same rule as ops/align.align_hits)
        g_max = max(8, min(args.g_block, (1 << 17) // lq))
        for start in range(0, len(rs), g_max):
            g = len(rs[start : start + g_max])
            yield rs[start : start + g_max], (
                g if g == g_max else max(8, 1 << (g - 1).bit_length())
            )

    n_pairs = args.queries * args.hits
    pad_cells = float(sum(
        g_pad * args.k_lanes * lq * lt
        for (lq, lt), rs in cells.items()
        for _, g_pad in chunks_of(lq, rs)
    ))
    lane_fill = sum(len(r[3]) for r in rows) / (
        len(rows) * args.k_lanes
    )
    print(json.dumps({
        "case": "workload",
        "pairs": n_pairs,
        "cells": len(cells),
        "true_gcells": round(true_cells / 1e9, 1),
        "padded_gcells": round(pad_cells / 1e9, 1),
        "pad_factor": round(pad_cells / true_cells, 2),
        "lane_fill": round(lane_fill, 3),
    }), flush=True)
    if args.workload_only:
        return

    import functools

    @functools.lru_cache(maxsize=None)
    def block_fn(g_pad, lq, lt):
        """ONE jitted dispatch per block: on-device codes + pad masking +
        the align kernel fused. The first anchor measurement ran these as
        ~8 eager ops per block — every eager op is a relay round-trip, and
        that dispatch tax (not the DP) dominated the 207 s warm pass."""
        use_pallas = (args.k_lanes % 128 == 0
                      and lt * args.k_lanes <= MAX_LT_K_HBM)

        def f(key, ql, tl):
            kq, kt = jax.random.split(key)
            q = jax.random.randint(kq, (g_pad, lq), 0, 20, dtype=jnp.int32)
            t = jax.random.randint(
                kt, (g_pad, args.k_lanes, lt), 0, 20, dtype=jnp.int32
            )
            q = jnp.where(jnp.arange(lq)[None, :] < ql[:, None], q, -1)
            t = jnp.where(
                jnp.arange(lt)[None, None, :] < tl[:, :, None], t, -1
            )
            # same dispatch rule as ops/align.align_hits: the Pallas
            # VMEM-resident kernel when the cell fits its budget, the
            # XLA grouped kernel for the long-target tail
            if use_pallas:
                return sw_scores_grouped_pallas(q, t)
            return sw_scores_grouped(q, t, scan_chunk=args.scan_chunk)

        return jax.jit(f)

    # assemble per-cell chunks of length arrays; keys and length arrays
    # land on device OUTSIDE the timed loop (they are KBs; production
    # feeds real codes over PCIe — the timed region is codegen+align)
    cell_blocks = {}
    for (lq, lt), rs in sorted(cells.items()):
        blocks = []
        for bi, (chunk, g_pad) in enumerate(chunks_of(lq, rs)):
            ql = np.zeros(g_pad, np.int32)
            tl = np.zeros((g_pad, args.k_lanes), np.int32)
            for i, (_, _, q_len, t_chunk) in enumerate(chunk):
                ql[i] = q_len
                tl[i, : len(t_chunk)] = t_chunk
            key = jax.random.PRNGKey(hash((lq, lt, bi)) & 0x7FFFFFFF)
            blocks.append(
                (key, jnp.asarray(ql), jnp.asarray(tl))
            )
        cell_blocks[(lq, lt)] = blocks
    jax.block_until_ready([b for bs in cell_blocks.values() for b in bs])

    for label in ("compile+run", "warm"):
        t0 = time.time()
        outs = []
        for (lq, lt), blocks in sorted(cell_blocks.items()):
            for key, ql, tl in blocks:
                outs.append(block_fn(ql.shape[0], lq, lt)(key, ql, tl))
        for o in outs:
            jax.block_until_ready(o)
        float(jnp.sum(outs[-1]))  # relay sync
        secs = time.time() - t0
        print(json.dumps({
            "case": label,
            "pairs": n_pairs,
            "seconds": round(secs, 1),
            "pairs_per_s": round(n_pairs / secs, 1),
            "padded_gcells_per_s": round(pad_cells / secs / 1e9, 2),
            "vs_mmseqs_align_anchor": round(args.anchor_s / secs, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
