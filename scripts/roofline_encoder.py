"""Attribute the ProtT5-XL encoder's MXU-efficiency gap (VERDICT r2 #8).

At the token-budget batcher's 128x256 short-wide regime the encoder
measured 41.9k res/s (~51% MXU) in r2. This script times the layer's
pieces at the same geometry to find where the rest goes:

  M1  bare FFN matmuls (wi + relu + wo)   — the layer's FLOP mass
  M2  bare attention projections (q,k,v,o)
  M3  dense attention core (scores+softmax+pv, fp32 score tensor in HBM)
  M5  flash attention core (fused Pallas kernel, scores never leave VMEM)
  M4  4x rmsnorm (VPU tail)
  F   full 24-layer encode, dense attention path
  F2  full 24-layer encode, flash-kernel attention path

Timing methodology (the axon relay adds ~64 ms per host fetch, which
swamps 5-20 ms kernels): every measurement chains REPS iterations inside
ONE jit via lax.fori_loop with a data-dependent carry, fetches one scalar
at the end, and divides by REPS — device-only sequencing, one relay
round-trip per measurement.

Usage: python scripts/roofline_encoder.py [batch length [tags]]
(tags: comma-separated case prefixes, e.g. "M1,M7,F ,F4")
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.models import t5

B, L = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (128, 256)
# optional 3rd arg: comma-separated tag prefixes to run (e.g. "M1,M7,F ,F4")
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None


def selected(tag):
    return ONLY is None or any(tag.startswith(p) for p in ONLY)


D, DKV, DFF, H, LAYERS = 1024, 128, 16384, 32, 24
TOKENS = B * L
PEAK = 197e12  # v5e bf16
REPS = 8


def timed(step, x0, reps=REPS):
    """step: carry -> carry, chained `reps` times inside one jit."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c), x)

    out = run(x0)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def report(tag, secs, flops=None):
    if flops:
        eff = flops / secs / PEAK
        print(f"{tag:30s}: {secs*1e3:8.2f} ms  {flops/secs/1e12:6.1f} TF/s "
              f"({eff:5.1%} MXU)", flush=True)
    else:
        print(f"{tag:30s}: {secs*1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (TOKENS, D), jnp.bfloat16)
    wi = jax.random.normal(key, (D, DFF), jnp.bfloat16) * 0.02
    wo = jax.random.normal(key, (DFF, D), jnp.bfloat16) * 0.02
    wq = jax.random.normal(key, (D, H * DKV), jnp.bfloat16) * 0.02
    jax.block_until_ready((x, wi, wo, wq))

    def ffn(xc):
        h = jnp.maximum(
            jnp.dot(xc, wi, preferred_element_type=jnp.float32), 0.0
        ).astype(jnp.bfloat16)
        return jnp.dot(h, wo).astype(jnp.bfloat16)

    f_ffn = 2 * TOKENS * D * DFF * 2
    if selected("M1"):
        report("M1 FFN wi+relu+wo", timed(ffn, x), f_ffn)

    def proj4(xc):
        outs = [jnp.dot(xc, wq) for _ in range(4)]
        return sum(o[:, :D] for o in outs).astype(jnp.bfloat16)

    f_proj = 4 * 2 * TOKENS * D * H * DKV
    if selected("M2"):
        report("M2 q,k,v,o projections", timed(proj4, x), f_proj)

    # M8: q,k,v as ONE [D, 3·H·dkv] dot (weights concatenated once) — if
    # the wider matmul beats M2's per-projection rate, fusing the qkv
    # weights in models/t5.py is worth the conversion-layer churn.
    # MEASURED (r5, 128x256): REJECTED — M2's four separate dots run
    # 160.6 TF/s (81.5% MXU) while the fused wide dot + slice measures
    # 120.3 TF/s; the projections were never below the ceiling, so
    # models/t5.py keeps per-projection einsums.
    wqkv = jnp.concatenate([wq, wq, wq], axis=1)
    jax.block_until_ready(wqkv)

    def proj_qkv_fused(xc):
        out = jnp.dot(xc, wqkv)
        o = jnp.dot(out[:, : H * DKV], wq.T)
        return (xc + o[:, :D]).astype(jnp.bfloat16)

    if selected("M8"):
        report("M8 fused qkv + o projection", timed(proj_qkv_fused, x),
               f_proj)

    q = jax.random.normal(key, (B, H, L, DKV), jnp.bfloat16)
    mask = jnp.ones((B, L), bool)
    rel = jax.random.normal(key, (32, H), jnp.float32) * 0.1

    def attn_core(qc):
        s = jnp.einsum("bhqd,bhkd->bhqk", qc, qc,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", p, qc,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    f_core = 4 * B * H * L * L * DKV
    if selected("M3"):
        report("M3 dense attention core", timed(attn_core, q), f_core)

    from knn_for_homology_tpu.ops.flash_attention import flash_attention_t5

    def flash_core(qc):
        return flash_attention_t5(qc, qc, qc, mask, rel, block=min(512, L))

    if selected("M5"):
        report("M5 flash attention core", timed(flash_core, q), f_core)

    def vpu_tail(xc):
        for _ in range(4):
            var = jnp.mean(jnp.square(xc.astype(jnp.float32)), -1,
                           keepdims=True)
            xc = (xc * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
        return xc

    if selected("M4"):
        report("M4 4x rmsnorm (VPU tail)", timed(vpu_tail, x))

    f_layer = f_ffn + f_proj + f_core
    ids = jnp.asarray(
        np.random.RandomState(0).randint(3, 25, (B, L)).astype(np.int32)
    )
    emask = jnp.ones((B, L), bool)

    from knn_for_homology_tpu.ops.short_attention import short_attention_t5

    bias = jax.random.normal(key, (H, L, L), jnp.float32) * 0.1

    def short_core(qc):
        return short_attention_t5(qc, qc, qc, mask, bias)

    if selected("M6"):
        report("M6 short fused attn core", timed(short_core, q), f_core)

    from knn_for_homology_tpu.ops.ffn_pallas import fused_ffn_t5

    ln = jnp.ones((D,), jnp.bfloat16)

    def ffn_fused(xc):
        return fused_ffn_t5(xc, ln, wi, wo)

    # same FLOP mass as M1 plus the rmsnorm prologue / residual epilogue
    # that M1 omits (XLA fuses those into the matmul edges in-context)
    if selected("M7"):
        report("M7 fused FFN Pallas kernel", timed(ffn_fused, x), f_ffn)

    for tag, cfg in [
        ("F  24-layer encode (dense)", t5.T5Config(
            vocab_size=128, d_model=D, d_kv=DKV, d_ff=DFF,
            num_layers=LAYERS, num_heads=H, dtype=jnp.bfloat16,
            use_short_kernel=False, use_fused_ffn=False,
        )),
        ("F2 24-layer encode (flash)", t5.T5Config(
            vocab_size=128, d_model=D, d_kv=DKV, d_ff=DFF,
            num_layers=LAYERS, num_heads=H, dtype=jnp.bfloat16,
            blockwise_above=L - 1, use_flash_kernel=True,
            use_fused_ffn=False,
        )),
        ("F3 24-layer encode (short)", t5.T5Config(
            vocab_size=128, d_model=D, d_kv=DKV, d_ff=DFF,
            num_layers=LAYERS, num_heads=H, dtype=jnp.bfloat16,
            use_short_kernel=True, use_fused_ffn=False,
        )),
        ("F4 24-layer encode (fusedFFN)", t5.T5Config(
            vocab_size=128, d_model=D, d_kv=DKV, d_ff=DFF,
            num_layers=LAYERS, num_heads=H, dtype=jnp.bfloat16,
            use_short_kernel=False, use_fused_ffn=True,
        )),
    ]:
        if not selected(tag):
            continue
        shapes = jax.eval_shape(lambda: t5.init_params(cfg, seed=0))
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        vals = [
            (jax.random.normal(jax.random.fold_in(key, i), s.shape,
                               jnp.float32) * 0.02).astype(s.dtype)
            for i, s in enumerate(leaves)
        ]
        params = jax.tree_util.tree_unflatten(treedef, vals)
        jax.block_until_ready(params)
        reps = 4

        # params MUST be a jit argument — closed over, the 2.4 GB tree
        # becomes HLO constants and blows the compile relay (HTTP 413)
        @functools.partial(jax.jit, static_argnames=("_cfg",))
        def run(params, acc, _cfg):
            def body(i, c):
                a, n = c
                # barrier: makes the encode depend on the carry so XLA
                # cannot hoist it out of the loop (it did: 219% "MXU")
                ids_i, a = jax.lax.optimization_barrier((ids, a))
                out = t5.encode(params, ids_i, emask, _cfg)
                return (a + out.astype(jnp.float32), n + 1)
            return jax.lax.fori_loop(0, reps, body, (acc, jnp.int32(0)))

        acc0 = jnp.zeros((B, L, D), jnp.float32)
        out = run(params, acc0, cfg)
        jax.block_until_ready(out)
        float(jnp.sum(out[0][..., :1]))
        t0 = time.perf_counter()
        out = run(params, acc0, cfg)
        jax.block_until_ready(out)
        float(jnp.sum(out[0][..., :1]))
        t = (time.perf_counter() - t0) / reps
        report(tag, t, LAYERS * f_layer)
        print(f"   -> {TOKENS/t:,.0f} residues/s", flush=True)


if __name__ == "__main__":
    main()
