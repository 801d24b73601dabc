"""Pallas flash kernel vs XLA blockwise attention at L in {2k, 4k, 8k}.

Decides models/t5.py's `use_flash_kernel` default (VERDICT r1 #9): both
paths compute identical T5 encoder attention (relative-bias, masked); this
times one full encoder block forward at ProtT5-XL head geometry.

Usage: python scripts/bench_flash.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.models import t5


def bench(config, x, mask, params, reps=5):
    @jax.jit
    def fwd(x, mask):
        return t5.encode(params, x, mask, config)

    out = fwd(x, mask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fwd(x, mask))
    return (time.perf_counter() - t0) / reps


def main():
    # ProtT5-XL head geometry, 2 layers (relative timing is what matters)
    base = dict(
        vocab_size=128, d_model=1024, d_kv=128, d_ff=4096,
        num_layers=2, num_heads=8, dtype=jnp.bfloat16,
    )
    for L in (2048, 4096, 8192):
        b = max(1, 8192 // L)
        rng = np.random.RandomState(0)
        ids = rng.randint(3, 25, (b, L)).astype(np.int32)
        mask = np.ones((b, L), dtype=bool)
        row = {}
        for name, flash in [("xla-blockwise", False), ("pallas-flash", True)]:
            config = t5.T5Config(
                **base, blockwise_above=1024, use_flash_kernel=flash
            )
            params = t5.init_params(config, seed=0)
            dt = bench(
                config, jnp.asarray(ids), jnp.asarray(mask), params
            )
            row[name] = dt
            print(
                f"L={L} B={b} {name:14s}: {dt*1e3:8.2f} ms "
                f"({b * L / dt / 1e3:.1f}k tok/s)",
                flush=True,
            )
        speedup = row["xla-blockwise"] / row["pallas-flash"]
        print(f"L={L}: pallas speedup {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
