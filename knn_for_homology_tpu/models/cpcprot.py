"""CPCProt encoder — contrastive-predictive-coding protein embeddings.

The reference embeds with bio_embeddings' CPCProtEmbedder
(reference: cath/embed.py:13,35): CPCProt (Lu et al. 2020) splits the
sequence into non-overlapping patches of `patch_len` residues (11 in the
published model, remainder discarded; short sequences are padded up to one
patch), maps each patch to a z vector with an embedding + 1D-conv encoder,
and runs a GRU autoregressor over the patch sequence for context vectors c.
The protein-level embedding the reference consumes is z_mean — the mean of
z over patches (512-d for the published model).

Layer shapes are introspected from checkpoint tensors at conversion
(models/convert.py: convert_cpcprot_from_torch) so any CPCProt size loads.
The conv (torch Conv1d, 'same' semantics via explicit padding) and GRU
(torch gate order r, z, n with the reset gate applied to the hidden
projection) cores follow torch exactly; numeric parity vs a torch module
of the same spec is tested in tests/test_hf_parity.py.
"""

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class CPCProtConfig:
    vocab_size: int = 30
    embed_dim: int = 32
    patch_len: int = 11
    # (out_channels, kernel) per conv layer; ReLU between, mean-pool after
    conv_spec: Tuple[Tuple[int, int], ...] = ((64, 3), (64, 3), (512, 3))
    z_dim: int = 512  # = last conv out_channels
    c_dim: int = 512  # GRU hidden
    dtype: Any = jnp.float32


CPCPROT = CPCProtConfig()
TINY_CPCPROT = CPCProtConfig(
    embed_dim=8, patch_len=4, conv_spec=((8, 3), (16, 3)), z_dim=16, c_dim=12
)


def _conv1d_same(x, w, b):
    """torch Conv1d with symmetric zero padding; x [N, L, Cin],
    w [K, Cin, Cout]."""
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[((k - 1) // 2, k // 2)],
        dimension_numbers=("NLC", "LIO", "NLC"),
    )
    return out + b


def _encode_patches(params, patch_ids, config: CPCProtConfig):
    """[N, patch_len] token ids → [N, z_dim] patch codes."""
    x = params["embedding"][patch_ids].astype(config.dtype)
    for cell in params["convs"]:
        x = jax.nn.relu(_conv1d_same(x, cell["w"], cell["b"]))
    return x.mean(axis=1)  # pool over patch positions


def _gru_scan(z, cell, c_dim, dtype):
    """torch-convention GRU over [B, T, z_dim] → [B, T, c_dim]."""
    b = z.shape[0]
    h0 = jnp.zeros((b, c_dim), dtype)

    def step(h, xt):
        gx = (xt @ cell["w_x"] + cell["b_x"]).astype(jnp.float32)
        gh = (h @ cell["w_h"] + cell["b_h"]).astype(jnp.float32)
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        u = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = ((1.0 - u) * n + u * h.astype(jnp.float32)).astype(dtype)
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, jnp.swapaxes(z, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def encode(
    params: Params,
    patch_ids: jnp.ndarray,  # [B, n_patches, patch_len]
    config: CPCProtConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (z [B, T, z_dim], c [B, T, c_dim]) per patch."""
    b, t, p = patch_ids.shape
    z = _encode_patches(
        params, patch_ids.reshape(b * t, p), config
    ).reshape(b, t, -1)
    c = _gru_scan(z, params["gru"], config.c_dim, config.dtype)
    return z, c


@functools.partial(jax.jit, static_argnames=("config",))
def encode_jit(params, patch_ids, config: CPCProtConfig):
    return encode(params, patch_ids, config)


def init_params(config: CPCProtConfig, seed: int = 0) -> Params:
    rng = np.random.RandomState(seed)

    def w(*shape, scale=0.1):
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, config.dtype
        )

    convs = []
    in_ch = config.embed_dim
    for out_ch, k in config.conv_spec:
        convs.append({"w": w(k, in_ch, out_ch), "b": jnp.zeros((out_ch,), config.dtype)})
        in_ch = out_ch
    c = config.c_dim
    return {
        "embedding": w(config.vocab_size, config.embed_dim, scale=1.0),
        "convs": convs,
        "gru": {
            "w_x": w(config.z_dim, 3 * c),
            "w_h": w(c, 3 * c),
            "b_x": jnp.zeros((3 * c,), config.dtype),
            "b_h": jnp.zeros((3 * c,), config.dtype),
        },
    }


# TAPE's IUPAC vocabulary (CPCProt tokenizes with TAPE): 5 specials then
# the 25 extended residue letters in alphabetical order
CPC_PAD, CPC_MASK, CPC_CLS, CPC_SEP, CPC_UNK = 0, 1, 2, 3, 4
CPC_TOKENS = "ABCDEFGHIKLMNOPQRSTUVWXYZ"
CPC_VOCAB = {aa: i + 5 for i, aa in enumerate(CPC_TOKENS)}


def tokenize_patches(sequence: str, config: CPCProtConfig = CPCPROT,
                     vocab=None) -> np.ndarray:
    """[n_patches, patch_len] ids: remainder discarded, short sequences
    padded up to a single patch (CPCProt's patching rule)."""
    table = vocab or CPC_VOCAB
    ids = [table.get(aa, CPC_UNK) for aa in sequence.upper()]
    p = config.patch_len
    if len(ids) < p:
        ids = ids + [CPC_PAD] * (p - len(ids))
    n = len(ids) // p
    return np.asarray(ids[: n * p], dtype=np.int32).reshape(n, p)
