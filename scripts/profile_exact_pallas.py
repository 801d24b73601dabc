"""Where does exact/approx flat top-k time go at bench scale?

Pieces at n=131072, d=1024, k=1000, one 8192-query block:
  A   matmul only                          (the MXU floor)
  B8  exact kernel only, int8 pass-ids     (fused matmul + insertion)
  B32 exact kernel only, int32 pass-ids    (r2 state layout)
  P   packed int32 approx kernel only
  C   full exact path (kernel + reconstruct + sort + certificate)
  D   lax.top_k epilogue over the candidate buffer
  S   two-key sort epilogue (the exact path's)
  T   single-key int32 top_k epilogue (the packed path's)

Usage: python scripts/profile_exact_pallas.py [qb_inner ...]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from knn_for_homology_tpu.ops import exact_pallas as ep
from knn_for_homology_tpu.ops.distance import l2_normalize

N, D, K, QB = 131072, 1024, 1000, 8192
R, TILE = 8, 1024


def timed(fn, *args, reps=3):
    def sync(out):
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    return (time.perf_counter() - t0) / reps


def exact_kernel_only(db, q, qb_inner, idt, r=R, tile=TILE):
    nv = jnp.full((1,), N, jnp.int32)
    kern = functools.partial(
        ep._segment_topr_kernel, r_slots=r, metric="ip", n_db=N,
        precision=jax.lax.Precision.DEFAULT,
    )
    width = r * tile
    grid = (QB // qb_inner, N // tile)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qb_inner, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((qb_inner, width), lambda i, j: (i, 0)),
            pl.BlockSpec((qb_inner, width), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QB, width), jnp.float32),
            jax.ShapeDtypeStruct((QB, width), idt),
        ],
    )(nv, q, db)


def packed_kernel_only(db, q, qb_inner, r, tile):
    nv = jnp.full((1,), N, jnp.int32)
    n_tiles = N // tile
    jbits = max(1, (n_tiles - 1).bit_length())
    kern = functools.partial(
        ep._segment_packed_kernel, r_slots=r, metric="ip", n_db=N,
        precision=jax.lax.Precision.DEFAULT, jbits=jbits,
    )
    width = r * tile
    grid = (QB // qb_inner, n_tiles)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qb_inner, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((qb_inner, width), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((QB, width), jnp.int32),
    )(nv, q, db)


def main():
    qbs = [int(x) for x in sys.argv[1:]] or [64]
    key = jax.random.PRNGKey(0)
    db = l2_normalize(jax.random.normal(key, (N, D), jnp.float32)).astype(
        jnp.bfloat16
    )
    q = db[:QB]
    jax.block_until_ready(db)
    print("data ready", flush=True)

    @jax.jit
    def matmul_only(db, q):
        s = jax.lax.dot_general(
            q, db, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s, axis=1)

    t = timed(matmul_only, db, q)
    print(f"A matmul+rowmax       : {t*1e3:8.1f} ms ({QB/t:8.0f} q/s/blk)",
          flush=True)

    for qb in qbs:
        for idt, tag in ((jnp.int8, "B8 "), (jnp.int32, "B32")):
            try:
                f = jax.jit(
                    lambda db, q, qb=qb, idt=idt: exact_kernel_only(
                        db, q, qb, idt
                    )
                )
                t = timed(f, db, q)
                print(
                    f"{tag} exact kernel qb={qb:4d}: {t*1e3:8.1f} ms "
                    f"({QB/t:8.0f} q/s/blk)", flush=True,
                )
            except Exception as exc:
                print(f"{tag} qb={qb}: {str(exc)[:150]}", flush=True)
        for r, tile in ((7, 256), (3, 1024)):
            try:
                f = jax.jit(
                    lambda db, q, qb=qb, r=r, tile=tile: packed_kernel_only(
                        db, q, qb, r, tile
                    )
                )
                t = timed(f, db, q)
                print(
                    f"P   packed r={r} W={tile:4d} qb={qb:4d}: {t*1e3:8.1f} ms "
                    f"({QB/t:8.0f} q/s/blk)", flush=True,
                )
            except Exception as exc:
                print(f"P qb={qb}: {str(exc)[:150]}", flush=True)

    candid = jax.jit(
        lambda db, q: ep._candidates_and_topk(
            db, q, K, R, "ip", TILE, 64, False, False
        )
    )
    t = timed(candid, db, q)
    print(f"C full exact path     : {t*1e3:8.1f} ms ({QB/t:8.0f} q/s/blk)",
          flush=True)

    buf_v, buf_i = exact_kernel_only(db, q, 64, jnp.int8)
    buf_i32 = buf_i.astype(jnp.int32)

    @jax.jit
    def topk_epilogue(buf_v, buf_i):
        v, idx = jax.lax.top_k(buf_v, K)
        return v, jnp.take_along_axis(buf_i, idx, axis=1)

    t = timed(topk_epilogue, buf_v, buf_i32)
    print(f"D top_k epilogue      : {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def sort_epilogue(buf_v, buf_i):
        neg_v, ids_sorted = jax.lax.sort((-buf_v, buf_i), num_keys=2)
        return -neg_v[:, :K], ids_sorted[:, :K]

    t = timed(sort_epilogue, buf_v, buf_i32)
    print(f"S two-key sort epilog : {t*1e3:8.1f} ms", flush=True)

    pbuf = packed_kernel_only(db, q, 64, 3, 1024)

    @jax.jit
    def int_topk_epilogue(buf):
        return jax.lax.top_k(buf, K)

    t = timed(int_topk_epilogue, pbuf)
    print(f"T int32 top_k epilog  : {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
