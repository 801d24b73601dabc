"""Graph-ANN parameter sweep on TPU: q/s vs recall@10 at n=131072.

The per-iteration gather is the budget (~78 ms per 4096x336 rows — an XLA
row-gather wall of ~55 ns/row that neither int8, packed slabs, nor manual
Pallas DMA beats; see ops/graph_pallas.py). Throughput therefore scales
with expand*iters; this sweep finds the recall@10 >= 0.95 config with the
fewest gathered rows.

Usage: python scripts/sweep_graph.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from profile_graph import make_clustered  # noqa: E402 (same dir)

from knn_for_homology_tpu.ops.topk import flat_topk  # noqa: E402
from knn_for_homology_tpu.search.graph import GraphIndex  # noqa: E402


def main():
    n, d, q_n, k = 131072, 1024, 4096, 10
    db, queries = make_clustered(n, d, q_n)
    print(f"n={n} d={d} q={q_n} k={k}", flush=True)

    # ground truth
    _, gt_ids = flat_topk(db, queries, k)
    gt = np.asarray(gt_ids)
    q_host = np.asarray(queries)

    base = GraphIndex(degree=42)
    t0 = time.perf_counter()
    base.add(db)
    jax.block_until_ready(base._graph)
    print(f"build: {time.perf_counter() - t0:.1f} s (device-resident data)",
          flush=True)

    for beam, expand, iters in [
        (256, 8, 16),  # r1 default
        (128, 8, 8),
        (256, 8, 8),
        (128, 4, 12),
        (64, 8, 6),
        (128, 16, 4),
        (256, 16, 6),
        (128, 8, 6),
    ]:
        index = GraphIndex(
            degree=42, beam_width=beam, expand=expand, iters=iters,
            packed="never",
        )
        index._db = base._db
        index._graph = base._graph
        index.search(q_host, k)  # compile + warm at the full block shape
        t0 = time.perf_counter()
        sims, ids = index.search(q_host, k)
        dt = time.perf_counter() - t0
        recall = np.mean([
            len(set(ids[i]) & set(gt[i])) / k for i in range(q_n)
        ])
        print(
            f"beam={beam:4d} expand={expand:3d} iters={iters:3d}: "
            f"{q_n / dt:7.0f} q/s  recall@{k} {recall:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
