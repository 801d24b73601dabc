"""SeqVec (ELMo bi-LM) encoder in pure JAX.

Replaces bio_embeddings' SeqVecEmbedder (PyTorch ELMo,
reference: cath/embed.py:34-46) — the 3-layer protein language model whose
layers the reference exposes as SeqVec Sum / CharCNN / LSTM1 / LSTM2
(reference: cath/embed.py:100-105) and whose LSTM1 slice [1024:2048] is the
Pfam embedding (reference: pfam/embed_pfam_seqvec.py:77-78).

Architecture = original ELMo: CharCNN token encoder (char embedding →
multi-width convs → max-pool → highways → 512 projection) + 2-layer
bidirectional LSTM (4096 hidden, 512 projection, cell/proj clipping 3,
residual between layers). Output: 3 layers of [L, 1024]
(layer0 = token repr duplicated; layer1/2 = fwd‖bwd projections).

TPU-first detail: each protein "word" is a single residue, so the CharCNN is
a fixed function of the residue identity — we evaluate it once over the
25-letter alphabet and turn the whole CharCNN into a [vocab, 512] lookup
table (bit-identical outputs, zero conv work at embed time). The LSTMs run
as `lax.scan` over time with masked state carry, batched across sequences.
"""

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# residue vocabulary: index = position in AA_ORDER; unknowns → X
AA_ORDER = "ACDEFGHIKLMNPQRSTVWYX"
AA_TO_ID = {aa: i for i, aa in enumerate(AA_ORDER)}


@dataclass(frozen=True)
class ElmoConfig:
    char_embed_dim: int = 16
    filters: Tuple[Tuple[int, int], ...] = (
        (1, 32), (2, 32), (3, 64), (4, 128), (5, 256), (6, 512), (7, 1024),
    )
    n_highway: int = 2
    proj_dim: int = 512  # per-direction output dim; layers are 2*proj
    lstm_dim: int = 4096
    n_lstm_layers: int = 2
    cell_clip: float = 3.0
    proj_clip: float = 3.0
    dtype: Any = jnp.float32


SEQVEC = ElmoConfig()
TINY_ELMO = ElmoConfig(
    char_embed_dim=4,
    filters=((1, 8), (2, 8), (3, 16)),
    n_highway=1,
    proj_dim=16,
    lstm_dim=32,
    n_lstm_layers=2,
)


def tokenize(sequence: str) -> np.ndarray:
    return np.asarray(
        [AA_TO_ID.get(aa, AA_TO_ID["X"]) for aa in sequence.upper()],
        dtype=np.int32,
    )


# --- CharCNN → residue lookup table ------------------------------------------

# bilm-tf character conventions (raw byte values for characters; the special
# ids live above the byte range — the converted char_embed table is indexed
# with exactly these raw ids, so no +1 shift as AllenNLP's mapper applies to
# ITS re-padded table):
BOS_CHAR, EOS_CHAR = 256, 257  # <S> / </S> sentence-boundary "words"
BOW, EOW, CHAR_PAD = 258, 259, 260
MAX_WORD_CHARS = 8  # a residue word is [BOW, char, EOW] + padding

# lookup-table rows appended after the residue alphabet for the boundary
# words AllenNLP always runs the bi-LSTMs through
BOS_ID = len(AA_ORDER)
EOS_ID = len(AA_ORDER) + 1


def _char_ids_for_alphabet() -> np.ndarray:
    """[vocab+2, MAX_WORD_CHARS] bilm-tf char ids: one single-char word per
    residue plus the <S>/</S> boundary words."""
    words = [ord(aa) for aa in AA_ORDER] + [BOS_CHAR, EOS_CHAR]
    out = np.full((len(words), MAX_WORD_CHARS), CHAR_PAD, dtype=np.int32)
    for i, char_id in enumerate(words):
        out[i, 0] = BOW
        out[i, 1] = char_id
        out[i, 2] = EOW
    return out


def char_cnn_table(params: Params, config: ElmoConfig) -> jnp.ndarray:
    """Evaluate the CharCNN over the whole alphabet → [vocab, proj_dim]."""
    char_ids = jnp.asarray(_char_ids_for_alphabet())
    x = params["char_embedding"][char_ids]  # [V, W, E]
    feats = []
    for (width, n_out), conv in zip(config.filters, params["convs"]):
        # conv over the word dimension, VALID, then max-pool over positions
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            conv["w"].astype(jnp.float32),  # [width, E, n_out]
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + conv["b"]
        feats.append(jnp.max(jnp.tanh(y), axis=1))  # [V, n_out]
    h = jnp.concatenate(feats, axis=1)  # [V, total_filters]
    for hw in params["highways"]:
        gate = jax.nn.sigmoid(h @ hw["w_gate"] + hw["b_gate"])
        lin = jax.nn.relu(h @ hw["w_lin"] + hw["b_lin"])
        h = gate * lin + (1.0 - gate) * h
    return (h @ params["proj_w"] + params["proj_b"]).astype(config.dtype)


# --- LSTM with projection (ELMo flavour) --------------------------------------


def _lstm_scan(
    x: jnp.ndarray,  # [B, L, in_dim], time-major inside
    mask: jnp.ndarray,  # [B, L]
    cell: Params,
    config: ElmoConfig,
) -> jnp.ndarray:
    """Unidirectional LSTMP over the sequence; masked steps carry state."""
    b = x.shape[0]
    h0 = jnp.zeros((b, config.proj_dim), config.dtype)
    c0 = jnp.zeros((b, config.lstm_dim), jnp.float32)

    def step(carry, inputs):
        h, c = carry
        xt, mt = inputs  # [B, in], [B]
        gates = xt @ cell["w_x"] + h @ cell["w_h"] + cell["b"]
        i, f, g, o = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        c_new = jnp.clip(c_new, -config.cell_clip, config.cell_clip)
        h_full = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h_new = (h_full @ cell["w_proj"].astype(jnp.float32)).astype(config.dtype)
        h_new = jnp.clip(h_new, -config.proj_clip, config.proj_clip)
        keep = mt[:, None]
        h = jnp.where(keep, h_new, h)
        c = jnp.where(keep, c_new, c)
        return (h, c), h

    xs = (jnp.swapaxes(x, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, hs = jax.lax.scan(step, (h0, c0), xs)
    return jnp.swapaxes(hs, 0, 1)  # [B, L, proj]


def _reverse_padded(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Flip only the valid prefix of each right-padded row."""
    lengths = jnp.sum(mask, axis=1)
    l = x.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(l)[None, :]
    idx = jnp.clip(idx, 0, l - 1)
    return jnp.take_along_axis(x, idx[..., None] if x.ndim == 3 else idx, axis=1)


def encode(
    params: Params,
    token_ids: jnp.ndarray,  # [B, L] residue ids
    mask: jnp.ndarray,  # [B, L] bool
    config: ElmoConfig,
) -> jnp.ndarray:
    """→ [3, B, L, 2*proj_dim] layer activations (CharCNN, LSTM1, LSTM2).

    As in AllenNLP's ElmoEmbedder (what the reference's bio_embeddings ran),
    the bi-LSTMs process the sequence wrapped in <S>/</S> boundary words,
    whose positions are stripped from every output layer."""
    b, l = token_ids.shape
    table = char_cnn_table(params, config)  # [V+2, proj]
    lengths = jnp.sum(mask, axis=1)  # [B]

    # extended sequence: <S> x_1 … x_len </S> (EOS at a per-row position)
    pos = jnp.arange(l + 2)[None, :]
    ids_ext = jnp.pad(token_ids, ((0, 0), (1, 1)))
    ids_ext = jnp.where(pos == 0, BOS_ID, ids_ext)
    ids_ext = jnp.where(pos == lengths[:, None] + 1, EOS_ID, ids_ext)
    mask_ext = pos <= lengths[:, None] + 1
    repr_ext = table[ids_ext] * mask_ext[..., None].astype(config.dtype)

    token_repr = table[token_ids] * mask[..., None].astype(config.dtype)
    layer0 = jnp.concatenate([token_repr, token_repr], axis=-1)

    fwd_in, bwd_in = repr_ext, _reverse_padded(repr_ext, mask_ext)
    layers = [layer0]
    mask_f = mask[..., None].astype(config.dtype)
    for li in range(config.n_lstm_layers):
        fwd = _lstm_scan(fwd_in, mask_ext, params["lstm_fwd"][li], config)
        bwd = _lstm_scan(bwd_in, mask_ext, params["lstm_bwd"][li], config)
        if li > 0:  # ELMo residual connections between LSTM layers
            fwd = fwd + fwd_in
            bwd = bwd + bwd_in
        bwd_aligned = _reverse_padded(bwd, mask_ext)
        # strip the boundary positions; zero the padding
        layers.append(
            jnp.concatenate(
                [fwd[:, 1 : l + 1] * mask_f, bwd_aligned[:, 1 : l + 1] * mask_f],
                axis=-1,
            )
        )
        fwd_in, bwd_in = fwd, bwd
    return jnp.stack(layers, axis=0)


@functools.partial(jax.jit, static_argnames=("config",))
def encode_jit(params, token_ids, mask, config: ElmoConfig):
    return encode(params, token_ids, mask, config)


def init_params(config: ElmoConfig, seed: int = 0) -> Params:
    """Random init for tests; real SeqVec weights via models/convert.py."""
    rng = np.random.RandomState(seed)

    def w(*shape, scale=0.1):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, dtype=config.dtype
        )

    total_filters = sum(n for _, n in config.filters)

    def lstm_cell(in_dim):
        return {
            "w_x": w(in_dim, 4 * config.lstm_dim),
            "w_h": w(config.proj_dim, 4 * config.lstm_dim),
            "b": jnp.zeros((4 * config.lstm_dim,), config.dtype),
            "w_proj": w(config.lstm_dim, config.proj_dim),
        }

    return {
        "char_embedding": w(262, config.char_embed_dim, scale=1.0),
        "convs": [
            {"w": w(width, config.char_embed_dim, n), "b": jnp.zeros((n,), jnp.float32)}
            for width, n in config.filters
        ],
        "highways": [
            {
                "w_gate": w(total_filters, total_filters),
                "b_gate": jnp.zeros((total_filters,), jnp.float32),
                "w_lin": w(total_filters, total_filters),
                "b_lin": jnp.zeros((total_filters,), jnp.float32),
            }
            for _ in range(config.n_highway)
        ],
        "proj_w": w(total_filters, config.proj_dim),
        "proj_b": jnp.zeros((config.proj_dim,), jnp.float32),
        "lstm_fwd": [
            lstm_cell(config.proj_dim) for _ in range(config.n_lstm_layers)
        ],
        "lstm_bwd": [
            lstm_cell(config.proj_dim) for _ in range(config.n_lstm_layers)
        ],
    }
