#!/usr/bin/env python3
"""Measure the SW aligner's per-shape compile latency vs `scan_chunk`.

The TPU compiler's cost for the row scan is superlinear in trip count
(~14 s at Lq=128 vs ~300 s at 256 measured through this relay); the
nested-scan variant (ops/align.py sw_scores(scan_chunk=...)) keeps the
inner trip count at the chunk size. This script times FIRST-call compile
+ execute at the production bucket for each chunk setting, in-process
(run each chunk in a fresh process if jit caching is a concern — chunk
settings are distinct static args, so they do not share jit entries).

KNN_TPU_COMPILE_CACHE=0 python scripts/probe_sw_compile.py --chunks 0 64 128
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--lq", type=int, default=256)
    p.add_argument("--lt", type=int, default=256)
    p.add_argument("--chunks", type=int, nargs="+", default=[0, 64, 128])
    args = p.parse_args()

    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.align import sw_scores

    rng = np.random.RandomState(0)
    q = rng.randint(0, 20, (args.batch, args.lq)).astype(np.int32)
    t = rng.randint(0, 20, (args.batch, args.lt)).astype(np.int32)
    q[:, args.lq // 2 :] = -1  # realistic padding tails
    t[:, args.lt // 2 :] = -1
    qj, tj = jnp.asarray(q), jnp.asarray(t)

    base = None
    for chunk in args.chunks:
        t0 = time.time()
        out = np.asarray(sw_scores(qj, tj, scan_chunk=chunk))
        cold = time.time() - t0
        t0 = time.time()
        out2 = np.asarray(sw_scores(qj, tj, scan_chunk=chunk))
        warm = time.time() - t0
        if base is None:
            base = out
        else:
            np.testing.assert_array_equal(base, out)
        print(
            f"chunk={chunk}: first-call {cold:.1f}s warm {warm:.2f}s "
            f"(scores identical: True)",
            flush=True,
        )


if __name__ == "__main__":
    main()
