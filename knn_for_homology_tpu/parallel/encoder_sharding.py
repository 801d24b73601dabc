"""Encoder sharding: data-parallel batches + tensor-parallel T5 weights.

The reference runs its 3B-param encoder on one GPU in fp16
(reference: pfam/embed_t5_fp16.py:25) and parallelises nothing. Here the
encoder is laid out for a 2-D mesh (DATA_AXIS × MODEL_AXIS):

  * batch axis sharded over DATA_AXIS (query fan-out)
  * attention heads (q/k/v inner dim) and the 16k d_ff sharded over
    MODEL_AXIS — the classic Megatron split: one all-reduce per block,
    riding ICI, inserted automatically by GSPMD from these shardings.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import t5
from .mesh import DATA_AXIS, MODEL_AXIS


def t5_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for T5 params (Megatron-style column/row splits)."""

    def layer_spec():
        return {
            "attn": {
                "ln": P(),
                "q": P(None, MODEL_AXIS),  # column-parallel
                "k": P(None, MODEL_AXIS),
                "v": P(None, MODEL_AXIS),
                "o": P(MODEL_AXIS, None),  # row-parallel → all-reduce
            },
            "mlp": {
                "ln": P(),
                "wi": P(None, MODEL_AXIS),
                "wo": P(MODEL_AXIS, None),
            },
        }

    return {
        "embedding": P(),
        "rel_embedding": P(),
        "layers": [layer_spec() for _ in params["layers"]],
        "final_ln": P(),
    }


def shard_t5_params(params: Any, mesh: Mesh) -> Any:
    specs = t5_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def encode_sharded(params, token_ids, mask, config: t5.T5Config, mesh: Mesh):
    """Jit the encoder with batch sharded over DATA_AXIS and weights over
    MODEL_AXIS; XLA inserts the TP all-reduces and DP stays collective-free."""
    data = NamedSharding(mesh, P(DATA_AXIS, None))
    out_sharding = NamedSharding(mesh, P(DATA_AXIS, None, None))
    fn = jax.jit(
        lambda p, ids, m: t5.encode(p, ids, m, config),
        in_shardings=(
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                t5_param_specs(params),
                is_leaf=lambda x: isinstance(x, P),
            ),
            data,
            data,
        ),
        out_shardings=out_sharding,
    )
    return fn(params, token_ids, mask)
