#!/usr/bin/env python3
"""Grouped-vs-pair SW kernel rate comparison on one chip.

The pair-batched kernel (sw_scores) is MXU-bound on its per-row one-hot
substitution contractions (~3.3 G DP cells/s measured in r3); the
query-grouped kernel (sw_scores_grouped) replaces the contraction with a
profile plane slice (~0 FLOPs, 2 bytes/cell of HBM). This script measures
both at matched DP-cell totals to size the win before the rescoring
driver is built on it. One JSON line per point; cells/s counts PADDED DP
cells (B*Lq*Lt), the shape-for-shape kernel rate.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops.align import sw_scores, sw_scores_grouped

    rng = np.random.RandomState(0)

    def run(tag, fn, *args, pairs, cells, reps=3, **kw):
        out = jax.block_until_ready(fn(*args, **kw))  # compile + warm
        t_best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            float(jnp.sum(out))  # host fetch: relay sync quirk
            t_best = min(t_best, time.time() - t0)
        print(json.dumps({
            "case": tag,
            "pairs": pairs,
            "pairs_per_s": round(pairs / t_best, 1),
            "gcells_per_s": round(cells / t_best / 1e9, 2),
            "ms": round(t_best * 1e3, 1),
        }), flush=True)

    def codes(shape, length_frac=1.0):
        c = rng.randint(0, 20, size=shape).astype(np.int32)
        if length_frac < 1.0:
            keep = int(shape[-1] * length_frac)
            c[..., keep:] = -1
        return jnp.asarray(c)

    # ---- pair-batched baseline at the r3-measured shape ----
    b, lq, lt = 2048, 256, 256
    run(
        "pair-batched", sw_scores, codes((b, lq)), codes((b, lt)),
        pairs=b, cells=b * lq * lt, scan_chunk=128,
    )

    # ---- grouped kernel: sweep (G, K) at the same cell totals ----
    for g, k in ((4, 512), (16, 512), (16, 128), (64, 128), (8, 1024)):
        run(
            f"grouped-g{g}-k{k}", sw_scores_grouped,
            codes((g, lq)), codes((g, k, lt)),
            pairs=g * k, cells=g * k * lq * lt, scan_chunk=128,
        )

    # longer targets (the realistic full-protein tail)
    run(
        "grouped-g8-k512-lt512", sw_scores_grouped,
        codes((8, 256)), codes((8, 512, 512)),
        pairs=8 * 512, cells=8 * 512 * 256 * 512, scan_chunk=128,
    )

    # per-step op overhead dominates at unroll=1 (per-call times barely
    # move with 4x the work) — unroll amortizes it
    for u in (2, 4, 8):
        run(
            f"grouped-g16-k512-unroll{u}", sw_scores_grouped,
            codes((16, lq)), codes((16, 512, lt)),
            pairs=16 * 512, cells=16 * 512 * lq * lt,
            scan_chunk=128, unroll=u,
        )
        run(
            f"grouped-g64-k128-unroll{u}", sw_scores_grouped,
            codes((64, lq)), codes((64, 128, lt)),
            pairs=64 * 128, cells=64 * 128 * lq * lt,
            scan_chunk=128, unroll=u,
        )


if __name__ == "__main__":
    main()
