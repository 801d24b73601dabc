#!/usr/bin/env python3
"""Attribute the sq8-sym kernel's per-grid-step time (VERDICT r3 follow-up:
394k q/s = 2.5 µs/step at W=256/qb=512, but the int8 MXU dot alone is only
~0.7 µs — where do the other ~1.8 µs go?).

Ablation variants of `_segment_packed_sq8sym_kernel`, identical grid and
BlockSpecs so pipeline/revisit overheads stay comparable:

  full      — dot + scale + pack + R-slot insert (the production kernel)
  r1        — dot + scale + pack + 1-slot insert (insert-loop depth cost)
  nopack    — dot + raw-i32 insert into slot 0 (pack/scale cost)
  mxu       — dot + write row of dots into slot 0 (lower bound with the
              same memory traffic pattern)

`--e2e` instead decomposes the WHOLE production call (the gap between the
1.23 µs/step bare kernel = ~813k q/s extrapolated and the ~400k q/s
end-to-end bench): packed_pallas_topk on a prequantised SQ8Database vs
its pieces — query quantisation, kernel, decode epilogue (int32 top_k +
id/value unpack) — all chained-rep timed in one jit.

One JSON line per (variant, qb). Run on the TPU in the background.
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N, D, K, QB_TOTAL = 131072, 1024, 1000, 8192
TILE = 256
R = 7


def main_e2e():
    """Decompose the full production call at QB_TOTAL queries."""
    import jax
    import jax.numpy as jnp

    from knn_for_homology_tpu.ops import exact_pallas as ep
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.graph_pallas import quantize_int8

    key = jax.random.PRNGKey(0)
    db = l2_normalize(jax.random.normal(key, (N, D), jnp.float32))
    sq8 = ep.quantize_database(db)
    queries = db[:QB_TOTAL]
    n_tiles = N // TILE
    jbits = max(1, (n_tiles - 1).bit_length())
    width = R * TILE
    buf_key = jax.random.PRNGKey(1)
    buf = jax.random.randint(
        buf_key, (QB_TOTAL, width), -(2**30), 2**30, jnp.int32
    )
    jax.block_until_ready((sq8.db_i8, queries, buf))
    print("data ready", flush=True)

    variants = {
        # the whole production call on the prequantised db
        "e2e_prequant": lambda x: ep.packed_pallas_topk(
            sq8, x, K, metric="ip", query_block=512, recall_target=0.98
        )[1],
        # pieces
        "quantize_q": lambda x: quantize_int8(x)[0],
        "decode": lambda b: ep._decode_packed(b, K, TILE, jbits)[1],
        # decode split: the int32 top_k alone vs the unpack arithmetic
        "decode_topk": lambda b: jax.lax.top_k(b, K)[0],
    }
    inputs = {
        "e2e_prequant": queries,
        "quantize_q": queries,
        "decode": buf,
        "decode_topk": buf,
    }

    def chained(fn, reps):
        def f(x):
            acc = jnp.int32(0)
            for _ in range(reps):
                out = fn(x)
                acc = acc + out.reshape(-1)[0].astype(jnp.int32)
                x, acc = jax.lax.optimization_barrier((x, acc))
            return acc
        return jax.jit(f)

    for name, fn in variants.items():
        x = inputs[name]
        lo, hi = (1, 4) if name == "e2e_prequant" else (2, 12)
        f_lo, f_hi = chained(fn, lo), chained(fn, hi)
        for f in (f_lo, f_hi):
            jax.block_until_ready(f(x))
        def fetch_time(f):
            t0 = time.perf_counter()
            for _ in range(3):
                float(f(x))
            return (time.perf_counter() - t0) / 3
        t = (fetch_time(f_hi) - fetch_time(f_lo)) / (hi - lo)
        print(json.dumps({
            "variant": name,
            "ms_per_block": round(t * 1e3, 2),
            "us_per_query": round(t / QB_TOTAL * 1e6, 3),
            "qps_extrapolated": round(QB_TOTAL / max(t, 1e-9), 0),
        }), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from knn_for_homology_tpu.ops import exact_pallas as ep
    from knn_for_homology_tpu.ops.distance import l2_normalize
    from knn_for_homology_tpu.ops.graph_pallas import quantize_int8

    key = jax.random.PRNGKey(0)
    db = l2_normalize(jax.random.normal(key, (N, D), jnp.float32))
    db8, sc = quantize_int8(db)
    sc_row = sc.reshape(1, N)
    q8, _ = quantize_int8(db[:QB_TOTAL])
    jax.block_until_ready((db8, q8))
    print("data ready", flush=True)

    n_tiles = N // TILE
    jbits = max(1, (n_tiles - 1).bit_length())
    jmax = np.int32((1 << jbits) - 1)

    def kernel(nv_ref, q_ref, db_ref, sc_ref, buf_ref, *, variant):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            buf_ref[:] = jnp.full_like(buf_ref, ep.INT32_MIN)

        dots = jax.lax.dot_general(
            q_ref[:], db_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        tile = db_ref.shape[0]
        if variant == "mxu":
            buf_ref[:, :tile] = jnp.maximum(buf_ref[:, :tile], dots)
            return
        if variant == "nopack":
            bv = buf_ref[:, :tile]
            take = dots > bv
            buf_ref[:, :tile] = jnp.where(take, dots, bv)
            return
        sims = dots.astype(jnp.float32) * sc_ref[:]
        col_ids = j * tile + jax.lax.broadcasted_iota(
            jnp.int32, (sims.shape[0], tile), 1
        )
        valid = col_ids < nv_ref[0]
        r_slots = 1 if variant == "r1" else R
        ep._pack_and_insert(
            buf_ref, sims, valid, j, r_slots, tile, jbits
        )

    # The axon relay adds ~64 ms PER HOST FETCH (CLAUDE.md roofline notes):
    # timing one kernel call per fetch measures the relay, not the kernel.
    # Chain `reps` calls inside ONE jit behind optimization_barrier (defeats
    # CSE/loop-hoisting of identical calls) and difference two rep counts to
    # cancel the fetch+dispatch constant.
    def chained(variant, qb, reps):
        def f(q_in):
            acc = jnp.int32(0)
            x = q_in
            for _ in range(reps):
                buf = run_with(variant, qb, x)
                acc = acc + buf[0, 0]
                # acc depends on buf; routing x through the same barrier
                # SERIALIZES the chained calls (and defeats CSE)
                x, acc = jax.lax.optimization_barrier((x, acc))
            return acc
        return jax.jit(f)

    def run_with(variant, qb, q_in):
        nv = jnp.full((1,), N, jnp.int32)
        width = R * TILE
        grid = (QB_TOTAL // qb, n_tiles)
        kern = functools.partial(kernel, variant=variant)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((qb, D), lambda i, j: (i, 0)),
                pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
                pl.BlockSpec((1, TILE), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((qb, width), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((QB_TOTAL, width), jnp.int32),
        )(nv, q_in, db8, sc_row)

    def fetch_time(f):
        v = f(q8)
        jax.block_until_ready(v)
        float(v)
        t0 = time.perf_counter()
        for _ in range(3):
            float(f(q8))
        return (time.perf_counter() - t0) / 3

    for qb in (512,):
        for variant in ("mxu", "nopack", "r1", "full"):
            t_lo = fetch_time(chained(variant, qb, 2))
            t_hi = fetch_time(chained(variant, qb, 12))
            t = (t_hi - t_lo) / 10
            steps = (QB_TOTAL // qb) * n_tiles
            print(json.dumps({
                "variant": variant, "qb": qb,
                "ms_per_block": round(t * 1e3, 1),
                "us_per_step": round(t / steps * 1e6, 3),
                "qps_extrapolated": round(QB_TOTAL / max(t, 1e-9), 0),
            }), flush=True)


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        main_e2e()
    else:
        main()
