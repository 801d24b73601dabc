#!/usr/bin/env python3
"""Probe 2: beam_expand with PER-QUERY sel rows and bench-sized grids.

probe_beam_expand_scale.py cleared the kernel at 2 GiB pv but used one
shared sel row for all 8 queries — blind to any query<->slab
misalignment, which is exactly what the IVF DMA bench symptoms look like
(recall 0.13 with locality-sorted queries whose neighbours share cells).
This one varies sel per query and sweeps the grid size Q; the oracle
checks 8 spot rows. One JSON line per (groups, Q).
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
    e = 16
    rng = np.random.RandomState(1)
    for groups, q_n in ((1024, 8), (1024, 2048), (16384, 8), (16384, 2048)):
        n_rows = groups * deg_p
        pv = jax.block_until_ready(jax.random.randint(
            jax.random.PRNGKey(groups), (n_rows, d), -4, 5, dtype=jnp.int8
        ))
        pi = jnp.arange(n_rows, dtype=jnp.int32).reshape(groups, deg_p)
        sc = jnp.ones((groups, deg_p), jnp.float32)
        q = jnp.asarray(rng.randn(q_n, d).astype(np.float32))
        sel = rng.randint(0, groups, size=(q_n, e)).astype(np.int32)
        sims, ids = gp.beam_expand(
            jnp.asarray(sel), q, pv, pi, sc, deg_p, interpret=False
        )
        sims = np.asarray(jax.block_until_ready(sims))
        ids = np.asarray(ids)
        # oracle on 8 spread spot rows, compacted slab fetch
        spots = np.linspace(0, q_n - 1, 8).astype(int)
        probed = np.unique(sel[spots])
        slab_rows = (
            probed[:, None] * deg_p + np.arange(deg_p)[None, :]
        ).reshape(-1)
        pv_small = np.asarray(pv[jnp.asarray(slab_rows)])
        remap = {int(g): i for i, g in enumerate(probed)}
        sel_small = np.vectorize(remap.get)(sel[spots]).astype(np.int32)
        ref_s, ref_i = gp.beam_expand_reference(
            sel_small, np.asarray(q)[spots], pv_small,
            np.asarray(pi[jnp.asarray(probed)]),
            np.asarray(sc[jnp.asarray(probed)]), deg_p,
        )
        ids_ok = bool(np.array_equal(ids[spots], ref_i))
        finite = np.isfinite(ref_s)
        err = float(np.max(np.abs(sims[spots][finite] - ref_s[finite])))
        bad_rows = [
            int(r) for r in range(8)
            if not np.array_equal(ids[spots][r], ref_i[r])
            or np.max(np.abs(sims[spots][r][finite[r]]
                             - ref_s[r][finite[r]])) > 1e-2
        ]
        print(json.dumps({
            "groups": groups,
            "q_n": q_n,
            "pv_gib": round(n_rows * d / 2**30, 3),
            "ids_ok": ids_ok,
            "max_abs_err": round(err, 4),
            "bad_spot_rows": bad_rows,
        }), flush=True)
        del pv, pi, sc


if __name__ == "__main__":
    main()
