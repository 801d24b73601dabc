"""Attribute the ProtT5-XL encoder's MXU-efficiency gap (VERDICT r2 #8).

At the token-budget batcher's 128x256 short-wide regime the encoder
measured 41.9k res/s (~51% MXU). This script times the layer's pieces in
isolation at the same geometry to find where the other half goes:

  M1  bare FFN matmuls (wi + wo)          — the layer's FLOP mass
  M2  bare attention projections (q,k,v,o)
  M3  dense attention core (scores+softmax+pv)
  M4  layernorms + residuals + relu (VPU tail)
  E   one full encoder layer
  F   full 24-layer encode (the production number)

Usage: python scripts/roofline_encoder.py [batch length]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.models import t5

B, L = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (128, 256)
D, DKV, DFF, H, LAYERS = 1024, 128, 16384, 32, 24
TOKENS = B * L
PEAK = 197e12  # v5e bf16


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def report(tag, secs, flops):
    eff = flops / secs / PEAK
    print(f"{tag:28s}: {secs*1e3:8.2f} ms  {flops/secs/1e12:6.1f} TF/s "
          f"({eff:5.1%} MXU)", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (TOKENS, D), jnp.bfloat16)
    wi = jax.random.normal(key, (D, DFF), jnp.bfloat16) * 0.02
    wo = jax.random.normal(key, (DFF, D), jnp.bfloat16) * 0.02
    wq = jax.random.normal(key, (D, H * DKV), jnp.bfloat16) * 0.02
    jax.block_until_ready((x, wi, wo, wq))

    @jax.jit
    def ffn(x, wi, wo):
        h = jnp.maximum(
            jnp.dot(x, wi, preferred_element_type=jnp.float32), 0.0
        ).astype(jnp.bfloat16)
        return jnp.dot(h, wo, preferred_element_type=jnp.float32)

    f_ffn = 2 * TOKENS * D * DFF * 2
    report("M1 FFN wi+relu+wo", timed(ffn, x, wi, wo), f_ffn)

    @jax.jit
    def proj4(x, wq):
        return tuple(
            jnp.dot(x, wq, preferred_element_type=jnp.float32)
            for _ in range(4)
        )

    f_proj = 4 * 2 * TOKENS * D * H * DKV
    report("M2 q,k,v,o projections", timed(proj4, x, wq), f_proj)

    q = jax.random.normal(key, (B, H, L, DKV), jnp.bfloat16)

    @jax.jit
    def attn_core(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", p, q,
                          preferred_element_type=jnp.float32)

    f_core = 4 * B * H * L * L * DKV
    report("M3 dense attention core", timed(attn_core, q), f_core)

    @jax.jit
    def vpu_tail(x):
        for _ in range(4):
            var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1,
                           keepdims=True)
            x = (x * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
        return x

    t = timed(vpu_tail, x)
    print(f"{'M4 4x rmsnorm (VPU tail)':28s}: {t*1e3:8.2f} ms", flush=True)

    config = t5.T5Config(
        vocab_size=128, d_model=D, d_kv=DKV, d_ff=DFF,
        num_layers=LAYERS, num_heads=H, dtype=jnp.bfloat16,
    )
    shapes = jax.eval_shape(lambda: t5.init_params(config, seed=0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    vals = [
        (jax.random.normal(jax.random.fold_in(key, i), l.shape, jnp.float32)
         * 0.02).astype(l.dtype)
        for i, l in enumerate(leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, vals)
    jax.block_until_ready(params)

    ids = jnp.asarray(
        np.random.RandomState(0).randint(3, 25, (B, L)).astype(np.int32)
    )
    mask = jnp.ones((B, L), bool)

    @jax.jit
    def full(params, ids, mask):
        return t5.encode(params, ids, mask, config)

    f_layer = f_ffn + f_proj + f_core
    t = timed(full, params, ids, mask, reps=3)
    report("F  24-layer encode", t, LAYERS * f_layer)
    print(f"   -> {TOKENS/t:,.0f} residues/s", flush=True)
    print(f"   sum of pieces x24 would be: "
          f"{(timed(ffn, x, wi, wo)+timed(proj4, x, wq)+timed(attn_core, q))*24*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
