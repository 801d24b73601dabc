#!/usr/bin/env python3
"""Bisect the IVF DMA-path recall collapse at n=2^20 (TPU).

BENCH_r4 symptoms: union path recall 0.98 / DMA path 0.13 on the SAME
index; beam_expand verified exact on synthetic packed arrays at the same
sizes (probe_beam_expand_scale2.py). This runs the real index build and
checks each DMA-path stage against an oracle on spot queries. One JSON
line per check.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_ivf import make_clustered  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import graph_pallas as gp
    from knn_for_homology_tpu.ops.exact_pallas import exact_pallas_topk
    from knn_for_homology_tpu.search.ivf import IVFIndex, _route_sims

    n, d, clusters = 2**20, 1024, 8192
    db = make_clustered(jax.random.PRNGKey(0), n, d, clusters)
    queries = db[:2048]

    _, exact_ids = exact_pallas_topk(db, queries, 10, metric="ip")
    exact_ids = np.asarray(jax.block_until_ready(exact_ids))

    index = IVFIndex(
        metric="cosine", nprobe=16, kmeans_iters=16, store_fp32=False,
    ).add(db)
    del db
    print(json.dumps({"stage": "built"}), flush=True)

    def recall(ids):
        ids = np.asarray(ids)
        return round(float(np.mean([
            len(set(a.tolist()) & set(b[b >= 0].tolist())) / 10
            for a, b in zip(exact_ids, ids)
        ])), 4)

    # stage 1: full paths
    _, ids_u = index.search_device(queries, 10)
    print(json.dumps({"stage": "union", "recall": recall(ids_u)}), flush=True)
    index.UNION_MIN_Q = 1 << 30
    _, ids_d = index.search_device(queries, 10)
    print(json.dumps({"stage": "dma", "recall": recall(ids_d)}), flush=True)

    # stage 2: beam_expand on the REAL packed arrays vs the numpy oracle
    pv, pi, sc = index._packed
    route = _route_sims(queries, index._centroids, "cosine")
    _, sel = jax.lax.top_k(route, 16)
    sel = np.asarray(sel)
    sims, ids = gp.beam_expand(
        jnp.asarray(sel), queries, pv, pi, sc, 128, interpret=False
    )
    sims = np.asarray(jax.block_until_ready(sims))
    ids = np.asarray(ids)

    spots = np.linspace(0, 2047, 8).astype(int)
    probed = np.unique(sel[spots])
    slab_rows = (
        probed[:, None] * 128 + np.arange(128)[None, :]
    ).reshape(-1)
    pv_small = np.asarray(pv[jnp.asarray(slab_rows)])
    remap = {int(g): i for i, g in enumerate(probed)}
    sel_small = np.vectorize(remap.get)(sel[spots]).astype(np.int32)
    q_np = np.asarray(queries[jnp.asarray(spots)])
    ref_s, ref_i = gp.beam_expand_reference(
        sel_small, q_np, pv_small,
        np.asarray(pi[jnp.asarray(probed)]),
        np.asarray(sc[jnp.asarray(probed)]), 128,
    )
    ids_ok = bool(np.array_equal(ids[spots], ref_i))
    finite = np.isfinite(ref_s)
    err = float(np.max(np.abs(sims[spots][finite] - ref_s[finite])))
    print(json.dumps({
        "stage": "beam_expand-real-arrays",
        "ids_ok": ids_ok,
        "max_abs_err": round(err, 4),
    }), flush=True)

    # stage 3: candidate pool coverage — are the true neighbours even in
    # the probed cells' member lists? (isolates routing/balancing from
    # the kernel)
    pi_np = np.asarray(pi)
    cover = []
    for r, qrow in enumerate(spots):
        members = set(pi_np[sel[qrow]].reshape(-1).tolist())
        cover.append(
            len(set(exact_ids[qrow].tolist()) & members) / 10
        )
    print(json.dumps({
        "stage": "probe-coverage@10",
        "mean": round(float(np.mean(cover)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
