"""Where does exact/approx flat top-k time go at bench scale?

Pieces at n=131072, d=1024, k=1000, one 8192-query block:
  A  matmul only                        (the MXU floor)
  B  pallas segment-top-R kernel only   (fused matmul + insertion)
  C  B + two-key sort epilogue          (= exact_pallas_topk hot path)
  D  B + lax.top_k epilogue over buffer
  E  B + approx_max_k epilogue          (approx candidate)
  F  one-shot approx_max_k over full row (current approx path)

Usage: python scripts/profile_exact_pallas.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.ops import exact_pallas as ep
from knn_for_homology_tpu.ops.distance import l2_normalize
from knn_for_homology_tpu.ops.topk import oneshot_topk

N, D, K, QB = 131072, 1024, 1000, 8192
R, TILE = 8, 1024


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
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
        return jnp.max(s, axis=1)  # force materialisation w/o selection

    t = timed(matmul_only, db, q)
    print(f"A matmul+rowmax      : {t*1e3:8.1f} ms ({QB/t:8.0f} q/s/blk)",
          flush=True)

    candid = jax.jit(
        lambda db, q: ep._candidates_and_topk(
            db, q, K, R, "ip", TILE, 64, False, False
        )
    )
    t = timed(candid, db, q)
    print(f"C kernel+sort+cert   : {t*1e3:8.1f} ms ({QB/t:8.0f} q/s/blk)",
          flush=True)

    # kernel only: reuse internals via a thin wrapper
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def kernel_only(db, q):
        kern = functools.partial(
            ep._segment_topr_kernel, r_slots=R, metric="ip", n_db=N,
            precision=jax.lax.Precision.DEFAULT,
        )
        width = R * TILE
        grid = (QB // 64, N // TILE)
        buf_v, buf_i = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((64, D), lambda i, j: (i, 0)),
                pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((64, width), lambda i, j: (i, 0)),
                pl.BlockSpec((64, width), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((QB, width), jnp.float32),
                jax.ShapeDtypeStruct((QB, width), jnp.int32),
            ],
        )(q, db)
        return buf_v, buf_i

    t = timed(kernel_only, db, q)
    print(f"B kernel only        : {t*1e3:8.1f} ms ({QB/t:8.0f} q/s/blk)",
          flush=True)
    buf_v, buf_i = kernel_only(db, q)

    @jax.jit
    def topk_epilogue(buf_v, buf_i):
        v, idx = jax.lax.top_k(buf_v, K)
        return v, jnp.take_along_axis(buf_i, idx, axis=1)

    t = timed(topk_epilogue, buf_v, buf_i)
    print(f"D top_k epilogue     : {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def approx_epilogue(buf_v, buf_i):
        v, idx = jax.lax.approx_max_k(buf_v, K, recall_target=0.95)
        return v, jnp.take_along_axis(buf_i, idx, axis=1)

    t = timed(approx_epilogue, buf_v, buf_i)
    print(f"E approx epilogue    : {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def sort_epilogue(buf_v, buf_i):
        neg_v, ids_sorted = jax.lax.sort((-buf_v, buf_i), num_keys=2)
        return -neg_v[:, :K], ids_sorted[:, :K]

    t = timed(sort_epilogue, buf_v, buf_i)
    print(f"S two-key sort epilog: {t*1e3:8.1f} ms", flush=True)

    t = timed(
        lambda db, q: oneshot_topk(db, q, K, metric="ip", approx=True,
                                   recall_target=0.9),
        db, q,
    )
    print(f"F oneshot approx     : {t*1e3:8.1f} ms ({QB/t:8.0f} q/s/blk)",
          flush=True)


if __name__ == "__main__":
    main()
