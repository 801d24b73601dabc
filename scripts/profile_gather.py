"""Microbenchmark: which adjacency-gather shape is fastest on TPU?

Beam search's hot op is "fetch the e expanded nodes' neighbour vectors and
score them". Candidates per query C = expand*degree (8*42 = 336).

  A) scattered: gather C rows of [N, d] bf16 per query (current design)
  B) packed-int8: gather `expand` contiguous [degree*d] int8 slabs from a
     pre-packed [N, degree*d] neighbour matrix
  C) scattered-int8: gather C rows of [N, d] int8

All data generated ON DEVICE (axon tunnel h2d is ~3 MB/s).

Usage: python scripts/profile_gather.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N, D, DEG, E, Q = 131072, 1024, 42, 8, 4096


def timed(fn, *args, reps=5):
    # fetch a scalar to host each rep: through the axon relay,
    # block_until_ready alone returns before the work is actually done
    # (measured "45 TB/s" gathers otherwise)
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        acc += float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)

    # jit the int8 generation: eager randint materialises the int32
    # intermediate (21 GB for the packed matrix) before the cast
    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def gen_int8(k, shape):
        return jax.random.randint(k, shape, -127, 128).astype(jnp.int8)

    db16 = jax.random.normal(ks[0], (N, D), jnp.bfloat16)
    db8 = gen_int8(ks[1], (N, D))
    q16 = jax.random.normal(ks[3], (Q, D), jnp.bfloat16)
    ids_flat = jax.random.randint(ks[4], (Q, E * DEG), 0, N, jnp.int32)
    ids_exp = jax.random.randint(ks[5], (Q, E), 0, N, jnp.int32)
    jax.block_until_ready((db16, db8, q16, ids_flat, ids_exp))
    print("data ready", flush=True)

    @jax.jit
    def scattered_bf16(db, ids, q):
        vecs = db[ids]  # [Q, C, d]
        return jnp.einsum("qcd,qd->qc", vecs, q,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def scattered_int8(db, ids, q):
        vecs = db[ids].astype(jnp.bfloat16)
        return jnp.einsum("qcd,qd->qc", vecs, q,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def packed_int8(packed, ids, q):
        slabs = packed[ids]  # [Q, E, deg*d] contiguous rows
        vecs = slabs.reshape(Q, E * DEG, D).astype(jnp.bfloat16)
        return jnp.einsum("qcd,qd->qc", vecs, q,
                          preferred_element_type=jnp.float32)

    bytes_moved = Q * E * DEG * D * 2
    t = timed(scattered_bf16, db16, ids_flat, q16)
    print(f"A scattered bf16 : {t*1e3:8.2f} ms  "
          f"({bytes_moved/t/1e9:6.1f} GB/s)", flush=True)

    t = timed(scattered_int8, db8, ids_flat, q16)
    print(f"C scattered int8 : {t*1e3:8.2f} ms  "
          f"({bytes_moved/2/t/1e9:6.1f} GB/s)", flush=True)

    # free the scattered dbs before materialising the 5.6 GB packed
    # matrix (HBM is 15.75 GB; everything at once overflows by ~10 MB)
    del db16, db8
    packed8 = gen_int8(ks[2], (N, DEG * D))
    jax.block_until_ready(packed8)
    t = timed(packed_int8, packed8, ids_exp, q16)
    print(f"B packed int8    : {t*1e3:8.2f} ms  "
          f"({bytes_moved/2/t/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
