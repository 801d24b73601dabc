"""ProtXLNet encoder — XLNet's inference path (content stream only).

The reference embeds with bio_embeddings' ProtTransXLNetUniRef100Embedder,
i.e. an HF XLNetModel forward pass (reference: cath/embed.py:19,41). At
inference (no permutation targets) XLNet reduces to a Transformer-XL
encoder: per-layer relative attention with the three learned biases
(content r_w, position r_r, segment r_s), sinusoidal relative position
embeddings with the reshape-shift alignment, post-LayerNorm residuals and
an exact-GELU feed-forward. The query stream and memory cache only exist
during pretraining and are omitted; the segment term is skipped exactly as
HF does when no token_type_ids are passed (bio_embeddings passes none).

Conversion from HF checkpoints lives in models/convert.py
(convert_xlnet_from_hf); numeric parity vs torch XLNetModel is tested in
tests/test_hf_parity.py.
"""

import functools
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class XLNetConfig:
    vocab_size: int = 37
    d_model: int = 1024
    d_inner: int = 4096
    num_layers: int = 30
    num_heads: int = 16
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def d_head(self) -> int:
        return self.d_model // self.num_heads


# Rostlab/prot_xlnet shape config (weights via conversion)
PROTXLNET = XLNetConfig()
TINY_XLNET = XLNetConfig(
    vocab_size=32, d_model=32, d_inner=64, num_layers=2, num_heads=4
)


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    return (
        ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale
        + bias
    )


def _rel_shift(x: jnp.ndarray, klen: int) -> jnp.ndarray:
    """Align the [B, H, L, 2L] position-score matrix so column j holds the
    sinusoid for relative distance i-j (XLNet's reshape trick)."""
    b, n, i, j = x.shape
    x = x.reshape(b, n, j, i)[:, :, 1:, :]
    return x.reshape(b, n, i, j - 1)[:, :, :, :klen]


def _sinusoid_pos_emb(length: int, d_model: int) -> jnp.ndarray:
    """Relative positions L .. -L+1 (bidirectional attention span)."""
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, d_model, 2, dtype=np.float64) / d_model)
    )
    pos_seq = np.arange(length, -length, -1, dtype=np.float64)
    sinusoid = np.outer(pos_seq, inv_freq)
    return jnp.asarray(
        np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1),
        dtype=jnp.float32,
    )  # [2L, d_model]


def _rel_attn(x, pos_emb, mask_cost, p, config: XLNetConfig):
    scale = 1.0 / np.sqrt(config.d_head)
    q = jnp.einsum("bld,dnh->blnh", x, p["q"])
    k = jnp.einsum("bld,dnh->blnh", x, p["k"])
    v = jnp.einsum("bld,dnh->blnh", x, p["v"])
    r = jnp.einsum("jd,dnh->jnh", pos_emb, p["r"])
    ac = jnp.einsum(
        "binh,bjnh->bnij", q + p["r_w_bias"], k,
        preferred_element_type=jnp.float32,
    )
    bd = jnp.einsum(
        "binh,jnh->bnij", q + p["r_r_bias"], r,
        preferred_element_type=jnp.float32,
    )
    bd = _rel_shift(bd, klen=ac.shape[3])
    # segment term ef is skipped: HF sets it to 0 when token_type_ids=None
    score = (ac + bd) * scale - mask_cost
    prob = jax.nn.softmax(score, axis=-1).astype(x.dtype)
    vec = jnp.einsum("bnij,bjnh->binh", prob, v)
    out = jnp.einsum("binh,dnh->bid", vec, p["o"])
    return _layer_norm(x + out, p["ln_attn"], p["ln_attn_b"],
                       config.layer_norm_eps)


def _ff(x, p, config: XLNetConfig):
    h = jax.nn.gelu(
        jnp.einsum("bld,df->blf", x, p["ff_w1"]) + p["ff_b1"],
        approximate=False,
    )
    h = jnp.einsum("blf,fd->bld", h, p["ff_w2"]) + p["ff_b2"]
    return _layer_norm(x + h, p["ln_ff"], p["ln_ff_b"],
                       config.layer_norm_eps)


def encode(
    params: Params,
    token_ids: jnp.ndarray,  # [B, L]
    mask: jnp.ndarray,  # [B, L] True = real token
    config: XLNetConfig,
) -> jnp.ndarray:
    b, l = token_ids.shape
    x = params["embedding"][token_ids].astype(config.dtype)
    pos_emb = _sinusoid_pos_emb(l, config.d_model).astype(config.dtype)
    # content stream: padded keys masked out, but the diagonal stays
    # attendable (HF's non_tgt_mask) so pad rows never go all -inf
    allow = mask[:, None, None, :] | jnp.eye(l, dtype=bool)[None, None]
    mask_cost = jnp.where(allow, 0.0, 1e30).astype(jnp.float32)
    for p in params["layers"]:
        x = _rel_attn(x, pos_emb, mask_cost, p, config)
        x = _ff(x, p, config)
    return x


@functools.partial(jax.jit, static_argnames=("config",))
def encode_jit(params, token_ids, mask, config: XLNetConfig):
    return encode(params, token_ids, mask, config)


def init_params(config: XLNetConfig, seed: int = 0) -> Params:
    rng = np.random.RandomState(seed)
    d, f, n, h = (
        config.d_model, config.d_inner, config.num_heads, config.d_head
    )

    def w(*shape, scale=0.02):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, config.dtype
        )

    def layer():
        return {
            "q": w(d, n, h), "k": w(d, n, h), "v": w(d, n, h),
            "o": w(d, n, h), "r": w(d, n, h),
            "r_w_bias": w(n, h), "r_r_bias": w(n, h), "r_s_bias": w(n, h),
            "seg_embed": w(2, n, h),
            "ln_attn": jnp.ones((d,), config.dtype),
            "ln_attn_b": jnp.zeros((d,), config.dtype),
            "ff_w1": w(d, f), "ff_b1": jnp.zeros((f,), config.dtype),
            "ff_w2": w(f, d), "ff_b2": jnp.zeros((d,), config.dtype),
            "ln_ff": jnp.ones((d,), config.dtype),
            "ln_ff_b": jnp.zeros((d,), config.dtype),
        }

    return {
        "embedding": w(config.vocab_size, d, scale=1.0),
        "layers": [layer() for _ in range(config.num_layers)],
    }


# XLNet sentencepiece special ids (HF XLNetTokenizer convention). Residue
# ids follow the ProtTrans frequency order as the documented default; real
# converted checkpoints override via the tokenizer table stored in meta
# (models/convert.py), like the T5 path.
XLNET_UNK, XLNET_SEP, XLNET_PAD, XLNET_CLS = 0, 4, 5, 3
XLNET_TOKENS = "LAGVESIKRDTPNQFYMHCWXUBZO"
XLNET_VOCAB = {aa: i + 7 for i, aa in enumerate(XLNET_TOKENS)}


def tokenize(sequence: str, vocab=None) -> np.ndarray:
    """Residues + <sep> + <cls> — XLNet appends specials at the END.
    U/Z/O/B → X per bio_embeddings' ProtTrans preprocessing (same as
    t5.tokenize / tokenize_bert)."""
    table = vocab or XLNET_VOCAB
    ids = [
        table.get("X" if aa in "UZOB" else aa, XLNET_UNK)
        for aa in sequence.upper()
    ]
    ids.extend([XLNET_SEP, XLNET_CLS])
    return np.asarray(ids, dtype=np.int32)
