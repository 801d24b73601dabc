#!/usr/bin/env python3
"""SW aligner warm-up measurement: cold compile vs persistent-cache hit
vs warm step, per kernel shape (VERDICT r3 #5 — r2 asked for <60 s per
fresh shape; this records the three numbers).

Run it twice: the first process pays the cold XLA compile (per fresh
shape), the second hits the persistent compile cache
(KNN_TPU_COMPILE_CACHE). Each invocation prints one JSON line per shape
with compile_s (time-to-first-result minus a warm rep) and warm_s.

Use --tag to force genuinely fresh shapes (it offsets K by 8 lanes, which
changes the compiled program without changing the workload class).
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
    p.add_argument("--shapes", default="256,128,256;256,128,384;512,128,512",
                   help="semicolon list of lq,k_lanes,lt")
    p.add_argument("--scan-chunk", type=int, default=128)
    p.add_argument("--unroll", type=int, default=1)
    p.add_argument("--g-block", type=int, default=32)
    p.add_argument("--tag", type=int, default=0,
                   help="offsets k_lanes (xla) / lt (pallas) by 8*tag "
                        "to force fresh shapes")
    p.add_argument("--kernel", choices=("xla", "pallas"), default="xla",
                   help="pallas = the r4 VMEM-resident Mosaic kernel "
                        "(keeps k_lanes a lane multiple)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.align import sw_scores_grouped
    from knn_for_homology_tpu.ops.align_pallas import (
        sw_scores_grouped_pallas,
    )
    from knn_for_homology_tpu.utils.compile_cache import ensure_compile_cache

    def kernel(q, t):
        if args.kernel == "pallas":
            return sw_scores_grouped_pallas(q, t)
        return sw_scores_grouped(
            q, t, scan_chunk=args.scan_chunk, unroll=args.unroll
        )

    ensure_compile_cache()
    rng = np.random.RandomState(0)
    for entry in args.shapes.split(";"):
        lq, k_lanes, lt = (int(x) for x in entry.split(","))
        if args.kernel == "pallas":
            lt += 8 * args.tag
        else:
            k_lanes += 8 * args.tag
        q = jnp.asarray(rng.randint(0, 20, (args.g_block, lq), np.int32))
        t = jnp.asarray(
            rng.randint(0, 20, (args.g_block, k_lanes, lt), np.int32)
        )
        t0 = time.time()
        out = kernel(q, t)
        jax.block_until_ready(out)
        float(jnp.sum(out))
        first_s = time.time() - t0
        t0 = time.time()
        out = kernel(q, t)
        jax.block_until_ready(out)
        float(jnp.sum(out))
        warm_s = time.time() - t0
        pairs = args.g_block * k_lanes
        print(json.dumps({
            "shape": f"lq{lq}-k{k_lanes}-lt{lt}",
            "kernel": args.kernel,
            "scan_chunk": args.scan_chunk,
            "unroll": args.unroll,
            "compile_s": round(first_s - warm_s, 1),
            "warm_s": round(warm_s, 3),
            "warm_pairs_per_s": round(pairs / warm_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
