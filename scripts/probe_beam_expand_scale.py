#!/usr/bin/env python3
"""Probe: compiled beam_expand correctness vs its numpy oracle as the
packed slab array grows toward (and past) 2^31 bytes.

Motivation: the IVF per-probe DMA path measured recall 0.13 at n=2^20 /
d=1024 on TPU (pv = 16384*128*1024 bytes = exactly 2^31) while the union
path on the SAME index measured 0.98 — the kernel is the only difference.
This isolates the size at which the compiled kernel diverges. One JSON
line per size; match=False pins the bug.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import graph_pallas as gp

    d = 1024
    deg_p = 128
    rng = np.random.RandomState(0)
    for groups in (1024, 8192, 12288, 16000, 16384, 16448):
        n_rows = groups * deg_p
        # int8 slabs straight away (a float db of this size won't fit) —
        # generated ON DEVICE (a 2 GiB host array would crawl through the
        # ~3 MB/s tunnel for 10 minutes); the oracle only reads the 16
        # probed slabs, fetched individually below. ids = the packed row
        # index, scales = 1 → the oracle's dequant dot is exact.
        pv = jax.block_until_ready(jax.random.randint(
            jax.random.PRNGKey(groups), (n_rows, d), -4, 5, dtype=jnp.int8
        ))
        pi = jnp.arange(n_rows, dtype=jnp.int32).reshape(groups, deg_p)
        sc = jnp.ones((groups, deg_p), jnp.float32)
        q = jnp.asarray(rng.randn(8, d).astype(np.float32))
        # probe cells spread across the whole range INCLUDING the tail
        sel = np.stack([
            np.linspace(0, groups - 1, 16).astype(np.int32)
            for _ in range(8)
        ])
        sims, ids = gp.beam_expand(
            jnp.asarray(sel), q, pv, pi, sc, deg_p, interpret=False
        )
        sims = np.asarray(jax.block_until_ready(sims))
        ids = np.asarray(ids)
        # oracle over a COMPACTED copy holding just the 16 probed slabs
        # (fetching the full 2 GiB pv to the host would take ~10 min
        # through the tunnel); ids in the small table are the original
        # packed rows, so outputs compare directly
        probed = np.unique(sel[0])
        slab_rows = (
            probed[:, None] * deg_p + np.arange(deg_p)[None, :]
        ).reshape(-1)
        pv_small = np.asarray(pv[jnp.asarray(slab_rows)])
        remap = {int(g): i for i, g in enumerate(probed)}
        sel_small = np.vectorize(remap.get)(sel).astype(np.int32)
        ref_s, ref_i = gp.beam_expand_reference(
            sel_small, np.asarray(q), pv_small,
            np.asarray(pi[jnp.asarray(probed)]),
            np.asarray(sc[jnp.asarray(probed)]), deg_p,
        )
        ids_ok = bool(np.array_equal(ids, ref_i))
        finite = np.isfinite(ref_s)
        err = float(
            np.max(np.abs(sims[finite] - ref_s[finite]))
            / max(np.max(np.abs(ref_s[finite])), 1e-9)
        )
        # per-probe-column mismatch map shows WHERE it breaks
        col_bad = [
            int(c) for c in range(16)
            if not np.array_equal(ids[:, c], ref_i[:, c])
            or np.max(np.abs(sims[:, c][finite[:, c]]
                             - ref_s[:, c][finite[:, c]])) > 1e-2
        ]
        print(json.dumps({
            "groups": groups,
            "pv_gib": round(n_rows * d / 2**30, 3),
            "ids_ok": ids_ok,
            "rel_err": round(err, 6),
            "bad_probe_cols": col_bad[:16],
        }), flush=True)
        del pv, pi, sc


if __name__ == "__main__":
    main()
