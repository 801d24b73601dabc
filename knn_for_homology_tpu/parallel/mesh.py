"""Device-mesh helpers.

The reference is single-node with no distributed communication (SURVEY.md §2:
FAISS OpenMP threads + a ProcessPoolExecutor are its only parallelism). Here
scale-out is first-class: searches and encoders run under `shard_map`/`pjit`
over a `jax.sharding.Mesh`, with XLA collectives riding ICI.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"  # database/query sharding axis (ICI)
MODEL_AXIS = "model"  # tensor-parallel axis for the encoder (ICI)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))
