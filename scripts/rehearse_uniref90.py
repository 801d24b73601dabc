"""UniRef90-scale rehearsal on one chip (VERDICT r1 #10).

Builds a spilled sharded ANN index (--index graph|ivf; ivf = lean
int8-slab shards) over >= 4M synthetic clustered vectors by streaming
shards through HBM (parallel/scale.py ShardSweep), then queries 4096
vectors and reports:

  * per-shard build seconds (== per-chip build on a pod, builds being
    embarrassingly parallel)
  * one-chip sweep q/s (shards sequential) and the pod estimate
    (max per-shard query time + host merge — what a 16-chip pod does
    concurrently)
  * recall@10 vs the sharded-exact scan over the same shards
  * peak host RSS and the per-shard HBM footprint

d=128 keeps the spill round-trip through the axon tunnel (~3 MB/s
host<->device) tractable; the per-row structure matches the pfam scale
workload in spirit (clustered unit vectors). Run with --full for the 4M
benchmark; default is a smoke size.

Usage: python scripts/rehearse_uniref90.py [--full]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.ops.distance import l2_normalize
from knn_for_homology_tpu.ops.topk import flat_topk
from knn_for_homology_tpu.parallel.scale import ShardSweep


def rss_mb():
    with open("/proc/self/status") as fp:
        for line in fp:
            if line.startswith("VmHWM:"):
                return int(line.split()[1]) / 1024
    return float("nan")


def shard_vectors(seed, rows, d, n_centers):
    """Clustered unit vectors generated on device (the tunnel is ~3 MB/s —
    host-side generation would dominate the wall clock)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    centers = l2_normalize(jax.random.normal(k1, (n_centers, d), jnp.float32))
    assign = jax.random.randint(k2, (rows,), 0, n_centers)
    pts = centers[assign] + 0.35 * l2_normalize(
        jax.random.normal(k3, (rows, d))
    )
    return l2_normalize(pts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="4M rows")
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--rows", type=int, default=None, help="rows per shard")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--index",
        default="graph",
        choices=["graph", "ivf"],
        help="per-shard index: graph = beam navigation; ivf = k-means"
        " routing + int8 cluster slabs (the equal-memory sub-linear mode)",
    )
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--dir", type=Path, default=Path("/tmp/uniref_rehearsal"))
    args = ap.parse_args()
    shards = args.shards or (16 if args.full else 4)
    rows = args.rows or (262144 if args.full else 8192)
    n = shards * rows
    print(
        f"n={n} ({shards} shards x {rows}), d={args.d}, index={args.index}",
        flush=True,
    )

    sweep = ShardSweep(
        args.dir, degree=42, beam_width=128, expand=8, iters=8,
        index=args.index, nprobe=args.nprobe, kmeans_iters=8,
    )
    build_secs = []
    for s in range(shards):
        vecs = shard_vectors(1000 + s, rows, args.d, n_centers=max(rows // 64, 8))
        secs = sweep.build_shard(vecs)
        build_secs.append(secs)
        print(f"shard {s}: build {secs:.1f} s", flush=True)
    print(
        f"build: median shard {np.median(build_secs):.1f} s "
        f"(pod build == one shard; one-chip total {sum(build_secs):.0f} s)",
        flush=True,
    )

    # queries: near-duplicates of shard-0 points (hard: must also verify
    # cross-shard merge ordering against the exact scan)
    kq = jax.random.PRNGKey(7)
    qvecs = shard_vectors(1000, rows, args.d, n_centers=max(rows // 64, 8))
    sel = jax.random.randint(kq, (args.q,), 0, rows)
    queries = l2_normalize(
        qvecs[sel] + 0.25 * l2_normalize(
            jax.random.normal(kq, (args.q, args.d))
        )
    )
    q_host = np.asarray(queries)

    t0 = time.perf_counter()
    scores, ids, shard_secs = sweep.search(q_host, args.k)
    sweep_wall = time.perf_counter() - t0
    per_shard = float(np.median(shard_secs))
    print(
        f"query: one-chip sweep {args.q / sweep_wall:.0f} q/s wall "
        f"(incl. shard reload IO); median shard device+host pass "
        f"{per_shard:.2f} s -> pod estimate {args.q / per_shard:.0f} q/s",
        flush=True,
    )

    # sharded-exact ground truth: stream the same shards through flat_topk
    exact_s, exact_i = [], []
    offset = 0
    for s in range(shards):
        vecs = shard_vectors(1000 + s, rows, args.d, n_centers=max(rows // 64, 8))
        sv, si = flat_topk(vecs, queries, args.k)
        exact_s.append(np.asarray(sv))
        exact_i.append(np.asarray(si) + offset)
        offset += rows
    cs = np.concatenate(exact_s, axis=1)
    ci = np.concatenate(exact_i, axis=1)
    selx = np.argsort(-cs, axis=1, kind="stable")[:, : args.k]
    gt = np.take_along_axis(ci, selx, axis=1)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / args.k for i in range(args.q)]
    )
    if args.index == "ivf":
        # int8 cluster slabs (capacity-padded ~2x) + scales/ids + centroids
        hbm_mb = (2 * rows * (args.d + 8) + rows // 64 * args.d * 4) / 1e6
    else:
        hbm_mb = (rows * args.d * 4 + rows * 42 * 4) / 1e6
    print(
        f"recall@{args.k} vs sharded-exact: {recall:.4f}; "
        f"per-shard HBM {hbm_mb:.0f} MB; peak host RSS {rss_mb():.0f} MB",
        flush=True,
    )


if __name__ == "__main__":
    main()
