"""UniRep — the babbler-1900 mLSTM (reference registry entry
"UniRep", cath/embed.py:34-46).

Multiplicative LSTM (Krause et al.): an intermediate multiplicative state
m = (W_mx·x) ⊙ (W_mh·h) feeds the gate projections instead of h. Per-residue
hidden states are mean-pooled into the 1900-d protein vector. Runs as a
masked `lax.scan`, batched.
"""

import functools
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# UniRep babbler-1900 aa_to_int layout (churchlab/UniRep): pad=0, residues
# M..L at 1..21, O=22, rare (X/Z/B/J)→23, start=24, stop=25
UNIREP_AAS = "MRHKDESTNQCUGPAVIFYWL"
UNIREP_VOCAB = {aa: i + 1 for i, aa in enumerate(UNIREP_AAS)}
UNIREP_VOCAB["O"] = 22
for _rare in "XZBJ":
    UNIREP_VOCAB[_rare] = 23
UNIREP_PAD, UNIREP_START, UNIREP_STOP = 0, 24, 25


@dataclass(frozen=True)
class UniRepConfig:
    vocab_size: int = 26
    embed_dim: int = 10
    hidden_dim: int = 1900
    dtype: Any = jnp.float32


UNIREP = UniRepConfig()
TINY_UNIREP = UniRepConfig(embed_dim=4, hidden_dim=16)


def tokenize(sequence: str) -> np.ndarray:
    ids = [UNIREP_START]
    for aa in sequence.upper():
        ids.append(UNIREP_VOCAB.get(aa, UNIREP_VOCAB["X"]))
    return np.asarray(ids, dtype=np.int32)


def encode(
    params: Params,
    token_ids: jnp.ndarray,  # [B, L]
    mask: jnp.ndarray,  # [B, L]
    config: UniRepConfig,
) -> jnp.ndarray:
    """Per-position hidden states [B, L, hidden]."""
    b, l = token_ids.shape
    x = params["embedding"][token_ids].astype(config.dtype)  # [B, L, E]
    h0 = jnp.zeros((b, config.hidden_dim), config.dtype)
    c0 = jnp.zeros((b, config.hidden_dim), jnp.float32)

    def step(carry, inputs):
        h, c = carry
        xt, mt = inputs
        m = (xt @ params["wmx"]) * (h @ params["wmh"])
        gates = xt @ params["wx"] + m @ params["wh"] + params["b"]
        i, f, o, u = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(u)
        h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(config.dtype)
        keep = mt[:, None]
        return (
            jnp.where(keep, h_new, h),
            jnp.where(keep, c_new, c),
        ), jnp.where(keep, h_new, 0.0)

    xs = (jnp.swapaxes(x, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, hs = jax.lax.scan(step, (h0, c0), xs)
    return jnp.swapaxes(hs, 0, 1)


@functools.partial(jax.jit, static_argnames=("config",))
def encode_jit(params, token_ids, mask, config: UniRepConfig):
    return encode(params, token_ids, mask, config)


def init_params(config: UniRepConfig, seed: int = 0) -> Params:
    rng = np.random.RandomState(seed)

    def w(*shape, scale=0.1):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, config.dtype
        )

    h = config.hidden_dim
    return {
        "embedding": w(config.vocab_size, config.embed_dim, scale=1.0),
        "wmx": w(config.embed_dim, h),
        "wmh": w(h, h),
        "wx": w(config.embed_dim, 4 * h),
        "wh": w(h, 4 * h),
        "b": jnp.zeros((4 * h,), config.dtype),
    }
