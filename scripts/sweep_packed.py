#!/usr/bin/env python3
"""Sweep (db_tile, query_block, recall_target) for the flat-engine kernels
on the real TPU: the packed int32 approx kernel and the f32+id exact kernel
at the headline shape (n=131072, d=1024, k=1000, bf16 storage).

Writes one JSON line per config to stdout. Run in the background with the
output to a file (the axon compile relay serialises compiles; each config
is a fresh compile).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--k", type=int, default=1000)
    p.add_argument("--modes", default="approx,exact",
                   help="comma list: approx | exact | sq8 | sq8-sym")
    p.add_argument("--vmem-budget-mb", type=float, default=None,
                   help="override the planner budget (probe Mosaic's real cap)")
    p.add_argument("--configs", default=None,
                   help="semicolon list of tile,qb[,recall] entries")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import exact_pallas as ep
    from knn_for_homology_tpu.ops.distance import l2_normalize

    if args.vmem_budget_mb:
        ep.VMEM_BUDGET = int(args.vmem_budget_mb * 1024 * 1024)

    key = jax.random.PRNGKey(0)
    db = l2_normalize(
        jax.random.normal(key, (args.n, args.d), jnp.float32)
    ).astype(jnp.bfloat16)
    jax.block_until_ready(db)

    # exact reference ids on a subsample for recall measurement
    sub = 2048
    _, exact_ids = ep.exact_pallas_topk(db, db[:sub], args.k, metric="ip")
    exact_ids = np.asarray(exact_ids)

    def recall(ids):
        got = np.asarray(ids[:sub])
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / args.k
            for a, b in zip(got, exact_ids)
        ]))

    if args.configs:
        entries = []
        for c in args.configs.split(";"):
            parts = c.split(",")
            entries.append((
                int(parts[0]), int(parts[1]),
                float(parts[2]) if len(parts) > 2 else 0.95,
            ))
    else:
        entries = [
            (1024, 128, 0.95), (1024, 256, 0.95), (1024, 512, 0.95),
            (512, 256, 0.95), (512, 512, 0.95), (2048, 128, 0.95),
            (1024, 256, 0.9),
        ]

    for mode in args.modes.split(","):
        for tile, qb, rt in entries:
            label = dict(mode=mode, db_tile=tile, query_block=qb, recall_target=rt)
            try:
                def run():
                    if mode == "exact":
                        vals, ids = ep.exact_pallas_topk(
                            db, db, args.k, metric="ip", db_tile=tile,
                            query_block=qb,
                        )
                    else:
                        vals, ids = ep.packed_pallas_topk(
                            db, db, args.k, metric="ip", db_tile=tile,
                            query_block=qb, recall_target=rt,
                            storage="native" if mode == "approx" else mode,
                        )
                    jax.block_until_ready(ids)
                    np.asarray(ids[:1, :1])
                    return ids

                t0 = time.time()
                ids = run()  # compile + warmup
                compile_s = time.time() - t0
                t0 = time.time()
                ids = run()
                secs = time.time() - t0
                label.update(
                    qps=round(args.n / secs, 1),
                    seconds=round(secs, 3),
                    compile_s=round(compile_s, 1),
                )
                if mode != "exact":
                    label["recall"] = round(recall(ids), 4)
            except Exception as exc:  # Mosaic OOM etc.
                label["error"] = str(exc)[:300]
            print(json.dumps(label), flush=True)


if __name__ == "__main__":
    main()
