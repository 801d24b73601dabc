"""Persistent XLA compilation cache — compile each shape once per machine.

The SW aligner pays tens of seconds to minutes of XLA compile per
(batch, Lq, Lt) shape (scan trip count; CLAUDE.md), and relay-compile TPU
setups pay it per process. JAX's persistent compilation cache turns that
into a one-time cost: later processes load the compiled executable from
disk. Enabled lazily by the paths that hurt (ops/align.py, bench) —
opt out with KNN_TPU_COMPILE_CACHE=0, redirect with
KNN_TPU_COMPILE_CACHE_DIR.
"""

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_enabled = False


def ensure_compile_cache(min_compile_secs: float = 1.0) -> bool:
    """Idempotently point jax at a persistent on-disk compile cache."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("KNN_TPU_COMPILE_CACHE", "1") == "0":
        return False
    import jax

    path = os.environ.get("KNN_TPU_COMPILE_CACHE_DIR") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "knn_for_homology_tpu",
        "xla_cache",
    )
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        _enabled = True
        logger.info("persistent XLA compile cache at %s", path)
    except Exception as exc:  # pragma: no cover - config name drift
        logger.warning("compile cache unavailable: %s", exc)
        return False
    return True
