"""ProtT5 encoder in pure JAX — the pLM workhorse of the pipeline.

Replaces bio_embeddings' ProtTransT5XLU50Embedder (PyTorch/CUDA fp16,
reference: pfam/embed_t5_fp16.py:25, cath/embed.py:34-46) with a JAX/XLA
encoder: bf16 params (the TPU-native analogue of the reference's fp16 flag),
fp32 layernorm/softmax accumulation, batch axis shardable over a mesh (DP)
and the MLP/heads shardable over a model axis (TP) via sharding constraints.

Architecture = T5 v1.0 encoder as used by ProtT5-XL (3B): RMSNorm (no bias,
pre-norm), relative position bias on layer 0 shared across layers,
unscaled QK^T (T5 folds the scale into init), ReLU feed-forward, final norm.
Weights come from `models/convert.py` (HF checkpoint → param pytree); tests
run tiny random-init configs.
"""

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 128
    d_model: int = 1024
    d_kv: int = 128
    d_ff: int = 16384
    num_layers: int = 24
    num_heads: int = 32
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # blockwise (flash-style) attention kicks in above this length; the
    # reference instead hard-truncates at 3096 aa (pfam/embed_t5_fp16.py:29)
    # because dense attention memory explodes — blockwise removes that
    # ceiling (O(L) memory per query block, online softmax).
    attention_chunk: int = 512
    blockwise_above: int = 1024
    # use the fused Pallas flash kernel (ops/flash_attention.py) for the
    # blockwise path instead of the XLA scan formulation. Measured on v5e
    # (2-layer XL-geometry encoder forward, bf16): 1.65x faster at L=2048,
    # 2.98x at L=4096, 4.04x at L=8192 (scripts/bench_flash.py).
    # "auto" resolves at encode time: flash on TPU, XLA scan elsewhere
    # (interpret-mode Pallas on CPU would run the kernel in Python);
    # True/False force it either way (tests force True).
    use_flash_kernel: Any = "auto"  # "auto" | True | False
    # fused short-sequence attention (ops/short_attention.py) for the
    # dense regime L <= short_kernel_max. MEASURED NEGATIVE on v5e at
    # 128x256 (scripts/roofline_encoder.py): Mosaic issues the small
    # per-head [L, dk] dots at ~4.4 us each whether looped or batched
    # (17.8-18.2 ms/layer), while XLA's dense path fuses softmax into the
    # score matmul epilogues and runs 13-14 ms — full-encode 48.8k vs
    # 44.1k res/s. Kept as an opt-in ("auto" resolves to False) both as
    # the documented experiment and for future Mosaic versions.
    use_short_kernel: Any = "auto"  # "auto" (= off) | True | False
    short_kernel_max: int = 512
    # fused FFN Pallas kernel (ops/ffn_pallas.py): x + relu(rmsnorm(x)·wi)·wo
    # in one pass, the [tokens, d_ff] relu intermediate never leaving VMEM.
    # Measured (scripts/roofline_encoder.py, 128x256 ProtT5-XL-shape):
    # full 24-layer encode 54.2k res/s at 69.2% MXU vs 49.1k / 62.7%
    # dense — an 11% end-to-end win, so "auto" resolves to ON on TPU
    # (bf=1024 tiles fit the 16 MB scoped-VMEM ceiling; bf=2048 does
    # not inside the encoder loop). Off elsewhere (interpret mode).
    use_fused_ffn: Any = "auto"  # "auto" (= TPU) | True | False


# ProtT5-XL (t5-3b encoder) — reference model of pfam/embed_t5_fp16.py
PROTT5_XL = T5Config()
# tiny config for tests
TINY = T5Config(
    vocab_size=32, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4
)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5 LayerNorm: no mean subtraction, no bias; fp32 accumulation."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """Bidirectional T5 bucketing of key_pos - query_pos."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def position_bias(
    rel_embedding: jnp.ndarray, q_len: int, k_len: int, config: T5Config
) -> jnp.ndarray:
    """[1, heads, q_len, k_len] additive attention bias."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, config.rel_buckets, config.rel_max_distance
    )
    bias = rel_embedding[buckets]  # [q, k, heads]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _attention(x, params, bias, mask, config: T5Config):
    """Self-attention block (pre-norm). x [B, L, d]; bias [1, H, L, L] fp32."""
    b, l, _ = x.shape
    h, dk = config.num_heads, config.d_kv
    normed = rms_norm(x, params["ln"], config.layer_norm_eps)

    def proj(w):  # [d_model, h*dk]
        out = jnp.einsum("bld,dk->blk", normed, w)
        return out.reshape(b, l, h, dk)

    q = proj(params["q"])
    k = proj(params["k"])
    v = proj(params["v"])
    # T5: no 1/sqrt(dk) scaling
    scores = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    )
    scores = scores + bias
    scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    # fp32 PV accumulation, matching the blockwise/flash paths so neighbour
    # ranks don't depend on which attention formulation a length bucket hit
    ctx = jnp.einsum(
        "bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    out = jnp.einsum("blk,kd->bld", ctx.reshape(b, l, h * dk), params["o"])
    return x + out


def _attention_short(x, params, bias, mask, config: T5Config):
    """Dense attention through the fused short-sequence kernel
    (ops/short_attention.py): projections here, scores+softmax+PV fused,
    the precomputed [1, H, L, L] bias shared across layers."""
    from ..ops.short_attention import short_attention_t5

    b, l, _ = x.shape
    h, dk = config.num_heads, config.d_kv
    normed = rms_norm(x, params["ln"], config.layer_norm_eps)

    def proj(w):
        out = jnp.einsum("bld,dk->blk", normed, w).reshape(b, l, h, dk)
        return jnp.swapaxes(out, 1, 2)  # [B, H, L, dk]

    ctx = short_attention_t5(
        proj(params["q"]), proj(params["k"]), proj(params["v"]),
        mask, bias[0],
    )
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(b, l, h * dk)
    out = jnp.einsum("blk,kd->bld", ctx.astype(x.dtype), params["o"])
    return x + out


def _attention_flash(x, params, mask, config: T5Config):
    """Blockwise attention through the fused Pallas kernel
    (ops/flash_attention.py): qkv projections here, the softmax loop and the
    T5 bias computed in-kernel."""
    from ..ops.flash_attention import flash_attention_t5

    b, l, _ = x.shape
    h, dk = config.num_heads, config.d_kv
    normed = rms_norm(x, params["ln"], config.layer_norm_eps)

    def proj(w):
        out = jnp.einsum("bld,dk->blk", normed, w).reshape(b, l, h, dk)
        return jnp.swapaxes(out, 1, 2)  # [B, H, L, dk]

    ctx = flash_attention_t5(
        proj(params["q"]),
        proj(params["k"]),
        proj(params["v"]),
        mask,
        params["rel_embedding"],
        block=config.attention_chunk,
        num_buckets=config.rel_buckets,
        max_distance=config.rel_max_distance,
    )
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(b, l, h * dk)
    out = jnp.einsum("blk,kd->bld", ctx.astype(x.dtype), params["o"])
    return x + out


def _attention_blockwise(x, params, mask, config: T5Config):
    """Flash-style blockwise self-attention: O(L·chunk) score memory.

    Query chunks scan over key/value chunks carrying the online-softmax
    state (running max, normaliser, weighted-value accumulator); the T5
    relative-position bias is materialised per (q-chunk, k-chunk) block only.
    Matches dense attention to fp32 rounding (2e-4 tested in fp32 configs;
    bf16 configs agree at bf16 granularity — both paths accumulate PV in
    fp32 and cast once)."""
    b, l, _ = x.shape
    h, dk = config.num_heads, config.d_kv
    chunk = min(config.attention_chunk, l)
    pad = (-l) % chunk
    normed = rms_norm(x, params["ln"], config.layer_norm_eps)

    def proj(w):
        out = jnp.einsum("bld,dk->blk", normed, w).reshape(b, l, h, dk)
        if pad:
            out = jnp.pad(out, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return out

    q = proj(params["q"])
    k = proj(params["k"])
    v = proj(params["v"])
    l_p = l + pad
    n_chunks = l_p // chunk
    mask_p = jnp.pad(mask, ((0, 0), (0, pad))) if pad else mask
    kv_mask = mask_p.reshape(b, n_chunks, chunk)
    rel = params["rel_embedding"]

    positions = jnp.arange(l_p)

    def q_block(qi, q_chunk_arr):
        q_pos = qi * chunk + positions[:chunk]

        def kv_step(carry, inputs):
            acc, norm, running_max = carry
            k_chunk_arr, v_chunk_arr, m_chunk, kj = inputs
            k_pos = kj * chunk + positions[:chunk]
            buckets = relative_position_bucket(
                k_pos[None, :] - q_pos[:, None],
                config.rel_buckets,
                config.rel_max_distance,
            )
            bias = jnp.transpose(rel[buckets], (2, 0, 1))[None].astype(
                jnp.float32
            )  # [1, H, cq, ck]
            scores = jnp.einsum(
                "blhd,bmhd->bhlm",
                q_chunk_arr,
                k_chunk_arr,
                preferred_element_type=jnp.float32,
            ) + bias
            scores = jnp.where(m_chunk[:, None, None, :], scores, -1e9)
            new_max = jnp.maximum(running_max, scores.max(axis=-1))
            correction = jnp.exp(running_max - new_max)
            # zero masked keys: if every key so far is masked, exp(0)=1
            # would silently average masked values
            p = jnp.exp(scores - new_max[..., None]) * m_chunk[
                :, None, None, :
            ].astype(jnp.float32)
            acc = acc * correction[..., None] + jnp.einsum(
                "bhlm,bmhd->bhld", p, v_chunk_arr.astype(jnp.float32)
            )
            norm = norm * correction + p.sum(axis=-1)
            return (acc, norm, new_max), None

        init = (
            jnp.zeros((b, h, chunk, dk), jnp.float32),
            jnp.zeros((b, h, chunk), jnp.float32),
            jnp.full((b, h, chunk), -jnp.inf, jnp.float32),
        )
        (acc, norm, _), _ = jax.lax.scan(
            kv_step,
            init,
            (
                jnp.moveaxis(k.reshape(b, n_chunks, chunk, h, dk), 1, 0),
                jnp.moveaxis(v.reshape(b, n_chunks, chunk, h, dk), 1, 0),
                jnp.moveaxis(kv_mask, 1, 0),
                jnp.arange(n_chunks),
            ),
        )
        ctx = acc / jnp.maximum(norm[..., None], 1e-30)
        return jnp.moveaxis(ctx, 1, 2)  # [B, chunk, H, dk]

    q_chunks = jnp.moveaxis(q.reshape(b, n_chunks, chunk, h, dk), 1, 0)
    ctx = jax.lax.map(
        lambda args: q_block(args[0], args[1]),
        (jnp.arange(n_chunks), q_chunks),
    )  # [n_chunks, B, chunk, H, dk]
    ctx = jnp.moveaxis(ctx, 0, 1).reshape(b, l_p, h * dk)[:, :l]
    out = jnp.einsum(
        "blk,kd->bld", ctx.astype(x.dtype), params["o"]
    )
    return x + out


def _mlp(x, params, config: T5Config):
    use_fused = (
        jax.default_backend() == "tpu"  # measured win, see T5Config
        if config.use_fused_ffn == "auto"
        else bool(config.use_fused_ffn)
    )
    if use_fused:
        from knn_for_homology_tpu.ops.ffn_pallas import fused_ffn_t5

        b, l, d = x.shape
        out = fused_ffn_t5(
            x.reshape(b * l, d), params["ln"], params["wi"], params["wo"],
            eps=config.layer_norm_eps,
        )
        return out.reshape(b, l, d)
    normed = rms_norm(x, params["ln"], config.layer_norm_eps)
    hidden = jnp.einsum("bld,df->blf", normed, params["wi"])
    hidden = jax.nn.relu(hidden)
    # tensor-parallel friendly: d_ff is the natural model-axis shard dim
    out = jnp.einsum("blf,fd->bld", hidden, params["wo"])
    return x + out


def encode(
    params: Params,
    token_ids: jnp.ndarray,  # [B, L] int32
    mask: jnp.ndarray,  # [B, L] bool (True = real token)
    config: T5Config,
) -> jnp.ndarray:
    """Per-token hidden states [B, L, d_model]."""
    x = params["embedding"][token_ids].astype(config.dtype)
    length = token_ids.shape[1]
    blockwise = length > config.blockwise_above
    if not blockwise:
        bias = position_bias(
            params["rel_embedding"], length, length, config
        )
        use_short = length <= config.short_kernel_max and (
            False  # measured slower than XLA dense on v5e (see T5Config)
            if config.use_short_kernel == "auto"
            else bool(config.use_short_kernel)
        )
    for layer in params["layers"]:
        if blockwise:
            attn_params = dict(layer["attn"])
            attn_params["rel_embedding"] = params["rel_embedding"]
            use_flash = (
                jax.default_backend() == "tpu"
                if config.use_flash_kernel == "auto"
                else bool(config.use_flash_kernel)
            )
            if use_flash:
                x = _attention_flash(x, attn_params, mask, config)
            else:
                x = _attention_blockwise(x, attn_params, mask, config)
        elif use_short:
            x = _attention_short(x, layer["attn"], bias, mask, config)
        else:
            x = _attention(x, layer["attn"], bias, mask, config)
        x = _mlp(x, layer["mlp"], config)
    x = rms_norm(x, params["final_ln"], config.layer_norm_eps)
    return x


@functools.partial(jax.jit, static_argnames=("config",))
def encode_jit(params, token_ids, mask, config: T5Config):
    return encode(params, token_ids, mask, config)


def init_params(config: T5Config, seed: int = 0) -> Params:
    """Random init (tests / smoke); real weights come from models/convert.py."""
    rng = np.random.RandomState(seed)

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        return jnp.asarray(
            rng.randn(*shape).astype(np.float32) * scale, dtype=config.dtype
        )

    def layer():
        inner = config.num_heads * config.d_kv
        return {
            "attn": {
                "ln": jnp.ones((config.d_model,), config.dtype),
                "q": w(config.d_model, inner),
                "k": w(config.d_model, inner),
                "v": w(config.d_model, inner),
                "o": w(inner, config.d_model),
            },
            "mlp": {
                "ln": jnp.ones((config.d_model,), config.dtype),
                "wi": w(config.d_model, config.d_ff),
                "wo": w(config.d_ff, config.d_model),
            },
        }

    return {
        "embedding": w(config.vocab_size, config.d_model, scale=1.0),
        "rel_embedding": w(
            config.rel_buckets, config.num_heads, scale=0.1
        ),
        "layers": [layer() for _ in range(config.num_layers)],
        "final_ln": jnp.ones((config.d_model,), config.dtype),
    }


# --- ProtT5 tokenisation -----------------------------------------------------
# ProtT5 sentencepiece vocabulary: one token per residue. Rare residues
# U, Z, O, B are mapped to X before tokenisation (bio_embeddings does the
# same). This is the published prot_t5 layout; a converted checkpoint whose
# tokenizer differs should store its table under meta["vocab"]
# (models/convert.save_params), which load_t5_checkpoint returns and
# ProtT5Embedder then uses.
PAD_ID, EOS_ID, UNK_ID = 0, 1, 2
PROTT5_RESIDUE_ORDER = "ALGVSREDTIPKFQNYMHWC"  # ids 3..22
PROTT5_VOCAB = {aa: i + 3 for i, aa in enumerate(PROTT5_RESIDUE_ORDER)}
PROTT5_VOCAB["X"] = 23


def tokenize(sequence: str, vocab: Optional[Dict[str, int]] = None) -> np.ndarray:
    """Residue ids + EOS (reference preprocessing: UZOB → X)."""
    vocab = vocab or PROTT5_VOCAB
    seq = sequence.upper()
    ids = [vocab.get("X" if aa in "UZOB" else aa, UNK_ID) for aa in seq]
    ids.append(EOS_ID)
    return np.asarray(ids, dtype=np.int32)
