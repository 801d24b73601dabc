#!/usr/bin/env python3
"""Full-protein rescoring anchor: kNN-prefilter alignment at the
reference's scale vs the MMseqs2 CPU align step.

The reference aligned its full-protein prefilter output in 5m37s = 337 s
on CPU (reference: pfam/proteins.py:140-141, order 10^7 pairs). This
measures the native TPU pass at that workload: Q queries × K hits each,
lengths drawn from a lognormal protein-length mix (median ~330 aa,
clipped [50, 2048]) — the honest number includes all padding waste from
the (Lq, Lt, S) cell grid and partially-filled rows/lanes.

r5: the dispatch plan comes from ops/align.plan_align_cells — the SAME
packing the production align_hits entry point runs (including the ragged
K-lane packing; `--classic` reproduces the r4 one-target-per-lane plan
for an apples-to-apples pad-factor comparison). Codes are GENERATED ON
DEVICE per planned block (the axon host↔device tunnel is ~3 MB/s;
shipping 10^7 encoded pairs would swamp the measurement — a production
host feeds codes over PCIe instead). The Smith-Waterman DP is
data-independent (fixed trip counts per shape), so random codes with the
plan's pad masks and evenly-spaced segment separators reproduce the real
pass's compute profile exactly. Two passes: the first pays the per-shape
compiles (persistent-cached), the second is the steady-state number. One
JSON line each.
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class _Seq:
    """Length-only stand-in for a protein string: plan_align_cells only
    calls len(); identity hashing keeps every corpus entry its own
    packing group (real distinct sequences behave the same way)."""

    __slots__ = ("n",)

    def __init__(self, n):
        self.n = int(n)

    def __len__(self):
        return self.n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--queries", type=int, default=32768)
    p.add_argument("--hits", type=int, default=305)
    p.add_argument("--k-lanes", type=int, default=128)
    p.add_argument("--g-block", type=int, default=128)
    p.add_argument("--bucket", type=int, default=128)
    p.add_argument("--median-len", type=float, default=330.0)
    p.add_argument("--sigma", type=float, default=0.55)
    p.add_argument("--scan-chunk", type=int, default=128)
    p.add_argument("--anchor-s", type=float, default=337.0)
    p.add_argument("--classic", action="store_true",
                   help="disable ragged lane packing (the r4 plan)")
    p.add_argument("--workload-only", action="store_true",
                   help="print the packing stats and exit (no device work"
                        " — plan tuning runs host-side)")
    p.add_argument("--accounting", action="store_true",
                   help="per-piece cold-pass accounting (VERDICT r4 #3):"
                        " sync after EVERY block in pass 1 and split the"
                        " wall into first-dispatch / per-program compile /"
                        " repeat-dispatch. Run with"
                        " KNN_TPU_COMPILE_CACHE=0 for a true cold pass.")
    args = p.parse_args()

    from knn_for_homology_tpu.ops.align import (
        iter_align_blocks,
        plan_align_cells,
    )

    rng = np.random.RandomState(0)

    def lengths(size):
        raw = rng.lognormal(np.log(args.median_len), args.sigma, size)
        return np.clip(raw, 50, 2048).astype(np.int32)

    # a CORPUS of proteins, each querying `hits` others — the all-vs-all
    # kNN-rescoring shape (reference: pfam/proteins.py:140-141)
    corpus = [_Seq(n) for n in lengths(args.queries)]
    hits = []
    true_cells = 0.0
    for qi in range(args.queries):
        hit_ids = rng.randint(0, args.queries, args.hits)
        row = [corpus[h] for h in hit_ids]
        hits.append(row)
        lq = len(corpus[qi])
        true_cells += float(sum(lq * len(t) for t in row))

    cells = plan_align_cells(
        corpus, hits, args.k_lanes, args.g_block, args.bucket,
        ragged=not args.classic,
    )
    blocks = list(iter_align_blocks(cells, args.g_block))
    pad_cells = float(sum(
        g_pad * args.k_lanes * lq_b * lt_b
        for lq_b, lt_b, _, _, g_pad, _ in blocks
    ))
    filled = sum(
        len(e[0])
        for rows in cells.values()
        for _, lns in rows
        for ln in lns
        for e in ln
    )
    lane_res = sum(
        lt_b * args.k_lanes * g_pad
        for _, lt_b, _, _, g_pad, _ in blocks
    )
    programs = {
        (g_pad, lq_b, lt_b, s_b, sweep if s_b > 1 else 0)
        for lq_b, lt_b, s_b, sweep, g_pad, _ in blocks
    }
    n_pairs = args.queries * args.hits
    print(json.dumps({
        "case": "workload",
        "plan": "classic" if args.classic else "ragged",
        "pairs": n_pairs,
        "cells": len(cells),
        "blocks": len(blocks),
        "programs": len(programs),
        "true_gcells": round(true_cells / 1e9, 1),
        "padded_gcells": round(pad_cells / 1e9, 1),
        "pad_factor": round(pad_cells / true_cells, 2),
        "lane_fill": round(filled / lane_res, 3),
    }), flush=True)
    if args.workload_only:
        return

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.align import sw_scores_grouped
    from knn_for_homology_tpu.ops.align_pallas import (
        MAX_LT_K_HBM,
        sw_scores_grouped_pallas,
    )
    from knn_for_homology_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()

    @functools.lru_cache(maxsize=None)
    def block_fn(g_pad, lq, lt, s_b, sweep):
        """ONE jitted dispatch per program shape: on-device codes + pad
        masking + the align kernel fused (each eager op would cost a
        relay round-trip — the r4 measurement's dominant tax)."""
        use_pallas = (
            args.k_lanes % 128 == 0
            and lt * args.k_lanes <= MAX_LT_K_HBM
            and g_pad * lq <= 1 << 17
        )

        def f(key, ql, tl):
            kq, kt = jax.random.split(key)
            q = jax.random.randint(kq, (g_pad, lq), 0, 20, dtype=jnp.int32)
            t = jax.random.randint(
                kt, (g_pad, args.k_lanes, lt), 0, 20, dtype=jnp.int32
            )
            q = jnp.where(jnp.arange(lq)[None, :] < ql[:, None], q, -1)
            pos = jnp.arange(lt)
            t = jnp.where(pos[None, None, :] < tl[:, :, None], t, -1)
            if s_b > 1:
                # evenly-spaced separators: the DP's cost profile depends
                # on shapes + sweep count, not separator placement
                seg = lt // s_b
                t = jnp.where((pos % max(seg, 1))[None, None, :]
                              == max(seg, 1) - 1, -1, t)
            # same dispatch rule as ops/align.align_hits
            if use_pallas:
                return sw_scores_grouped_pallas(
                    q, t, segments=s_b,
                    max_seg_len=sweep if s_b > 1 else None,
                )
            assert s_b == 1, "ragged cells are Pallas-only"
            return sw_scores_grouped(q, t, scan_chunk=args.scan_chunk)

        return jax.jit(f)

    # per-block pad-mask arrays land on device OUTSIDE the timed loop
    # (KBs each; production feeds real codes over PCIe — the timed
    # region is codegen+align)
    staged = []
    for bi, (lq_b, lt_b, s_b, sweep, g_pad, block) in enumerate(blocks):
        ql = np.zeros(g_pad, np.int32)
        tl = np.zeros((g_pad, args.k_lanes), np.int32)
        for i, (row_seq, row_lanes) in enumerate(block):
            ql[i] = len(row_seq)
            for l, lane in enumerate(row_lanes):
                tl[i, l] = sum(len(e[0]) + 1 for e in lane) - 1
        key = jax.random.PRNGKey(bi)
        staged.append((
            (g_pad, lq_b, lt_b, s_b, sweep if s_b > 1 else 0),
            key, jnp.asarray(ql), jnp.asarray(tl),
        ))
    jax.block_until_ready([a for s in staged for a in s[1:]])

    if args.accounting:
        # pass 1 only, synced per block: attribute the cold wall.
        # "first" = the very first dispatch (backend init + first Mosaic
        # program through the relay); "compile" = later first-occurrence
        # blocks of each program shape; "dispatch" = repeat blocks of an
        # already-compiled shape (pure relay round-trip + kernel run).
        seen: set = set()
        acc = {"first": 0.0, "compile": 0.0, "dispatch": 0.0}
        counts = {"first": 0, "compile": 0, "dispatch": 0}
        t_all = time.time()
        for bi, (shape_key, key, ql, tl) in enumerate(staged):
            t0 = time.time()
            jax.block_until_ready(block_fn(*shape_key)(key, ql, tl))
            dt = time.time() - t0
            kind = ("first" if bi == 0
                    else "compile" if shape_key not in seen
                    else "dispatch")
            acc[kind] += dt
            counts[kind] += 1
            seen.add(shape_key)
        total = time.time() - t_all
        print(json.dumps({
            "case": "accounting",
            "plan": "classic" if args.classic else "ragged",
            "total_s": round(total, 1),
            "first_dispatch_s": round(acc["first"], 1),
            "program_compiles_s": round(acc["compile"], 1),
            "program_compiles_n": counts["compile"],
            "per_compile_s": round(
                acc["compile"] / max(counts["compile"], 1), 2),
            "repeat_dispatch_s": round(acc["dispatch"], 1),
            "repeat_dispatch_n": counts["dispatch"],
            "per_dispatch_ms": round(
                1e3 * acc["dispatch"] / max(counts["dispatch"], 1), 1),
        }), flush=True)
        return

    for label in ("compile+run", "warm"):
        t0 = time.time()
        outs = []
        for shape_key, key, ql, tl in staged:
            outs.append(block_fn(*shape_key)(key, ql, tl))
        for o in outs:
            jax.block_until_ready(o)
        float(jnp.sum(outs[-1]))  # relay sync
        secs = time.time() - t0
        print(json.dumps({
            "case": label,
            "plan": "classic" if args.classic else "ragged",
            "pairs": n_pairs,
            "seconds": round(secs, 1),
            "pairs_per_s": round(n_pairs / secs, 1),
            "padded_gcells_per_s": round(pad_cells / secs / 1e9, 2),
            "vs_mmseqs_align_anchor": round(args.anchor_s / secs, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
