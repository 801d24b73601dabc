"""PLUS-RNN encoder — stacked bidirectional LSTM protein LM.

The reference embeds with bio_embeddings' PLUSRNNEmbedder
(reference: cath/embed.py:16,38): PLUS-RNN (Min et al. 2021), an
embedding layer feeding a multi-layer bidirectional LSTM whose
concatenated forward/backward hidden states (2 x hidden_dim = 1024 for the
published model) are the per-residue representation.

The LSTM follows torch's cell exactly (gate order i, f, g, o;
c = sigmoid(f)*c + sigmoid(i)*tanh(g); h = sigmoid(o)*tanh(c)) so converted
checkpoints reproduce torch outputs; padding is handled like
pack_padded_sequence — the backward pass runs over the valid region only
(masked reverse, models/elmo.py uses the same device-side trick). Layer
dimensions are introspected from checkpoint shapes at conversion
(models/convert.py: convert_plus_rnn_from_torch); numeric parity vs
torch.nn.LSTM is tested in tests/test_hf_parity.py.
"""

import functools
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class PlusRnnConfig:
    vocab_size: int = 21
    embed_dim: int = 21
    hidden_dim: int = 512  # per direction; output is 2x
    num_layers: int = 3
    dtype: Any = jnp.float32


PLUS_RNN = PlusRnnConfig()
TINY_PLUS = PlusRnnConfig(embed_dim=8, hidden_dim=12, num_layers=2)


def _lstm_scan(x, mask, cell, hidden_dim, dtype):
    """Unidirectional torch-convention LSTM; masked steps carry state."""
    b = x.shape[0]
    h0 = jnp.zeros((b, hidden_dim), dtype)
    c0 = jnp.zeros((b, hidden_dim), jnp.float32)

    def step(carry, inputs):
        h, c = carry
        xt, mt = inputs
        gates = (xt @ cell["w_x"] + h @ cell["w_h"] + cell["b"]).astype(
            jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(dtype)
        keep = mt[:, None]
        h = jnp.where(keep, h_new, h)
        c = jnp.where(keep, c_new, c)
        return (h, c), h

    xs = (jnp.swapaxes(x, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, hs = jax.lax.scan(step, (h0, c0), xs)
    return jnp.swapaxes(hs, 0, 1)  # [B, L, hidden]


def _reverse_padded(x, mask):
    lengths = jnp.sum(mask, axis=1)
    l = x.shape[1]
    idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(l)[None, :], 0, l - 1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def encode(
    params: Params,
    token_ids: jnp.ndarray,  # [B, L]
    mask: jnp.ndarray,  # [B, L]
    config: PlusRnnConfig,
) -> jnp.ndarray:
    """[B, L, 2*hidden_dim] per-residue representations."""
    x = params["embedding"][token_ids].astype(config.dtype)
    h = config.hidden_dim
    for li in range(config.num_layers):
        fwd = _lstm_scan(x, mask, params["fwd"][li], h, config.dtype)
        bwd = _lstm_scan(
            _reverse_padded(x, mask), mask, params["bwd"][li], h, config.dtype
        )
        x = jnp.concatenate([fwd, _reverse_padded(bwd, mask)], axis=-1)
    return x * mask[..., None].astype(config.dtype)


@functools.partial(jax.jit, static_argnames=("config",))
def encode_jit(params, token_ids, mask, config: PlusRnnConfig):
    return encode(params, token_ids, mask, config)


def init_params(config: PlusRnnConfig, seed: int = 0) -> Params:
    rng = np.random.RandomState(seed)

    def w(*shape, scale=0.1):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, config.dtype
        )

    h = config.hidden_dim

    def cell(in_dim):
        return {
            "w_x": w(in_dim, 4 * h),
            "w_h": w(h, 4 * h),
            "b": jnp.zeros((4 * h,), config.dtype),
        }

    fwd, bwd = [], []
    in_dim = config.embed_dim
    for _ in range(config.num_layers):
        fwd.append(cell(in_dim))
        bwd.append(cell(in_dim))
        in_dim = 2 * h
    return {
        "embedding": w(config.vocab_size, config.embed_dim, scale=1.0),
        "fwd": fwd,
        "bwd": bwd,
    }


# PLUS's 21-letter protein alphabet: the 20 standard residues + X for
# everything else (documented default; converted checkpoints may override
# through the vocab stored in meta, like the T5/XLNet paths)
PLUS_TOKENS = "ARNDCQEGHILKMFPSTWYV"
PLUS_VOCAB = {aa: i for i, aa in enumerate(PLUS_TOKENS)}
PLUS_UNK = 20


def tokenize(sequence: str, vocab=None) -> np.ndarray:
    table = vocab or PLUS_VOCAB
    unk = table.get("X", PLUS_UNK)
    return np.asarray(
        [table.get(aa, unk) for aa in sequence.upper()], dtype=np.int32
    )
