"""Graph-ANN profiling harness (VERDICT r1 #3): where does beam_search time
go at the reference's pfam-proteins scale (n=131072, d=1024 —
reference: pfam/proteins_search.py:28-49)?

Targets: build <= 15 s, query >= 5k q/s at recall@10 >= 0.95.

Data model: clustered unit vectors (family structure like pLM embeddings —
random isotropic gaussians are adversarial for ANY graph method and are not
the workload). Generated on device: host->device over the axon tunnel is
slow and would dominate a naive wall-clock build measurement.

Usage: python scripts/profile_graph.py [--n 131072] [--pieces]
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
from knn_for_homology_tpu.search.graph import GraphIndex


def make_clustered(n, d, q_n, n_centers=2048, spread=0.35, seed=0):
    """Unit vectors around n_centers directions; queries near db points."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    centers = l2_normalize(jax.random.normal(k1, (n_centers, d), jnp.float32))
    assign = jax.random.randint(k2, (n,), 0, n_centers)
    # noise direction normalised so ||noise|| == spread exactly
    pts = centers[assign] + spread * l2_normalize(jax.random.normal(k3, (n, d)))
    db = l2_normalize(pts)
    q_src = jax.random.randint(k4, (q_n,), 0, n)
    q = l2_normalize(db[q_src] + 0.25 * l2_normalize(
        jax.random.normal(k2, (q_n, d))))
    return jax.block_until_ready(db), jax.block_until_ready(q)


def timed(fn, *args, warm=1, reps=3):
    for _ in range(warm):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--q", type=int, default=4096)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--degree", type=int, default=42)
    p.add_argument("--beam", type=int, default=256)
    p.add_argument("--expand", type=int, default=8)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--centers", type=int, default=2048)
    p.add_argument("--pieces", action="store_true")
    args = p.parse_args()

    db, queries = make_clustered(
        args.n, args.d, args.q, n_centers=args.centers
    )
    print(f"n={args.n} d={args.d} q={args.q} k={args.k} "
          f"centers={args.centers}", flush=True)

    index = GraphIndex(
        degree=args.degree,
        beam_width=args.beam,
        expand=args.expand,
        iters=args.iters,
    )
    t0 = time.perf_counter()
    index.add(db)
    jax.block_until_ready(index._graph)
    t_build = time.perf_counter() - t0
    print(f"build (cold, incl. compile): {t_build:.1f} s", flush=True)

    # exact ground truth for recall
    _, gt_ids = flat_topk(index._db, queries, args.k)
    gt = np.asarray(gt_ids)

    q_host = np.asarray(queries)
    t0 = time.perf_counter()
    sims, ids = index.search(q_host, args.k)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sims, ids = index.search(q_host, args.k)
    t_warm = time.perf_counter() - t0
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / args.k for i in range(args.q)
    ])
    print(
        f"query: cold {t_cold:.2f} s, warm {t_warm:.3f} s ="
        f" {args.q / t_warm:.0f} q/s, recall@{args.k} {recall:.4f}",
        flush=True,
    )

    if not args.pieces:
        return

    # ---- piecewise: isolate the per-iteration costs --------------------
    # (db passed as an argument — a closed-over device array would be
    # baked into the HLO as a literal and blow the compile-relay limit)
    rng = np.random.RandomState(1)
    db_t = index._db_traversal()
    graph = index._graph
    C = args.expand * args.degree
    ids_rand = jnp.asarray(
        rng.randint(0, args.n, size=(args.q, C)), jnp.int32
    )
    q_dev = queries.astype(jnp.bfloat16)

    @jax.jit
    def gather_score(db_ref, ids, q):
        vecs = db_ref[ids]
        return jnp.einsum(
            "qcd,qd->qc", vecs, q, preferred_element_type=jnp.float32
        )

    t, _ = timed(gather_score, db_t, ids_rand, q_dev)
    print(f"  gather+score [{args.q},{C}]x{args.d}: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def adj_gather(graph_ref, sel_ids):
        return graph_ref[sel_ids].reshape(args.q, -1)

    sel = jnp.asarray(rng.randint(0, args.n, size=(args.q, args.expand)),
                      jnp.int32)
    t, _ = timed(adj_gather, graph, sel)
    print(f"  adjacency gather [{args.q},{args.expand}]: {t*1e3:.2f} ms",
          flush=True)

    sims_cat = jnp.asarray(
        rng.randn(args.q, args.beam + C), jnp.float32
    )

    @jax.jit
    def merge_topk(s):
        return jax.lax.top_k(s, args.beam)

    t, _ = timed(merge_topk, sims_cat)
    print(f"  beam top_k [{args.q},{args.beam + C}]->{args.beam}:"
          f" {t*1e3:.2f} ms", flush=True)

    beam_ids = jnp.asarray(
        rng.randint(0, args.n, size=(args.q, args.beam)), jnp.int32
    )

    @jax.jit
    def dedup(nbrs, beam):
        dup_beam = jnp.any(nbrs[:, :, None] == beam[:, None, :], axis=2)
        c = nbrs.shape[1]
        earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)
        dup_intra = jnp.any(
            (nbrs[:, :, None] == nbrs[:, None, :]) & earlier[None], axis=2
        )
        return dup_beam | dup_intra

    t, _ = timed(dedup, ids_rand, beam_ids)
    print(f"  dedup compares: {t*1e3:.2f} ms", flush=True)

    iters = args.iters if args.iters is not None else max(
        8, max(args.beam, args.k) // max(args.expand, 1) // 2)
    print(f"  (beam_search iters={iters}; per-iter budget at 5k q/s:"
          f" {args.q / 5000 / iters * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
