"""ProtT5-XL-shape encoder throughput vs batch geometry on one v5e chip.

The r1 anchor was 25.2k residues/s at batch 8×1024 (bf16, dense attention).
Roofline: ~2 FLOP/param/token → 2.4 GFLOP/residue → ~80k res/s at full MXU;
this sweep finds how much of the gap is batch starvation.

Usage: python scripts/bench_encoder.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.models import t5


def main():
    config = t5.T5Config(
        vocab_size=128, d_model=1024, d_kv=128, d_ff=16384,
        num_layers=24, num_heads=32, dtype=jnp.bfloat16,
    )  # ProtT5-XL shape, 1.21B params
    # build params ON DEVICE from the init's shapes: materialising 2.4 GB
    # of host randoms and pushing them through the ~3 MB/s axon tunnel
    # takes ~13 minutes and measures nothing
    shapes = jax.eval_shape(lambda: t5.init_params(config, seed=0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(0)
    vals = []
    for i, l in enumerate(leaves):  # eager per-leaf device init
        vals.append(
            (jax.random.normal(
                jax.random.fold_in(key, i), l.shape, jnp.float32
            ) * 0.02).astype(l.dtype)
        )
    params = jax.tree_util.tree_unflatten(treedef, vals)
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e9:.2f}B (device init)", flush=True)

    # params as ARGUMENTS: a jit closure would bake 2.4 GB of constants
    # into the HLO and blow the compile relay's request limit (HTTP 413)
    @jax.jit
    def fwd(params, ids, mask):
        return t5.encode(params, ids, mask, config)

    for b, l in [(8, 1024), (16, 1024), (32, 1024), (16, 512), (64, 512),
                 (128, 256), (256, 256), (512, 256)]:
        rng = np.random.RandomState(0)
        ids = jnp.asarray(rng.randint(3, 25, (b, l)).astype(np.int32))
        mask = jnp.ones((b, l), bool)
        try:
            # scalar host fetch per rep: through the axon relay,
            # block_until_ready alone returns before work completes
            float(jnp.sum(fwd(params, ids, mask)))
            t0 = time.perf_counter()
            for _ in range(3):
                float(jnp.sum(fwd(params, ids, mask)))
            dt = (time.perf_counter() - t0) / 3
            tput = b * l / dt
            print(
                f"B={b:4d} L={l:5d}: {dt*1e3:7.1f} ms = {tput/1e3:6.1f}k"
                f" res/s ({tput * 2 * n_params / 1e12:5.1f} TF/s eff)",
                flush=True,
            )
        except Exception as e:  # OOM at big batches: report and continue
            print(f"B={b} L={l}: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
