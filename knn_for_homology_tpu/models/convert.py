"""Checkpoint conversion + native checkpoint format.

The reference downloads PyTorch/CUDA weights through bio_embeddings
(reference: cath/embed.py:12-29). Here the encoders are JAX; this module
converts upstream checkpoints to our param pytrees once, then loads them
from a flat .npz:

  * HF ProtT5 (pytorch_model.bin / model.safetensors) → T5 params
  * SeqVec ELMo (bilm-tf weights.hdf5 + options.json)  → ELMo params

Conversion needs the upstream file present locally (no downloads here);
loading the converted .npz needs only numpy.
"""

import json
import re
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

from .t5 import T5Config

# --- flat npz checkpoint format -----------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for key, val in tree.items():
            out.update(_flatten(val, f"{prefix}{key}/"))
    elif isinstance(tree, (list, tuple)):
        for i, val in enumerate(tree):
            out.update(_flatten(val, f"{prefix}{i}/"))
    else:
        arr = np.asarray(tree)
        if arr.dtype.kind == "V":  # bf16 saves as raw void; fp32 is lossless
            arr = arr.astype(np.float32)
        out[prefix[:-1]] = arr
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_params(params: Any, path: Path, meta: Dict[str, Any] = None) -> None:
    flat = _flatten(params)
    if meta:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)
    if Path(path).suffix != ".npz":
        Path(str(path) + ".npz").replace(path)


def load_params(path: Path) -> Tuple[Any, Dict[str, Any]]:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    meta = {}
    if "__meta__" in flat:
        meta = json.loads(bytes(flat.pop("__meta__")).decode())
    return _unflatten(flat), meta


def save_params_orbax(params: Any, path: Path) -> None:
    """Orbax checkpoint (sharded, async-capable) — the production store for
    billion-parameter trees where a flat npz gets unwieldy."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), params, force=True)


def load_params_orbax(path: Path, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(Path(path).absolute(), like)
        return ckptr.restore(Path(path).absolute())


# --- HF ProtT5 → T5 params ------------------------------------------------------


def _read_hf_state_dict(model_dir: Path) -> Dict[str, np.ndarray]:
    model_dir = Path(model_dir)
    safetensors = sorted(model_dir.glob("*.safetensors"))
    if safetensors:
        from safetensors.numpy import load_file

        state: Dict[str, np.ndarray] = {}
        for f in safetensors:
            state.update(load_file(f))
        return state
    bins = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(f"no checkpoint files in {model_dir}")
    state = {}
    for f in bins:
        for key, val in _torch_load(f).items():
            state[key] = val.float().numpy()
    return state


def _torch_load(path):
    """torch.load restricted to tensors (weights_only) so converting an
    untrusted downloaded .bin cannot execute pickle code; falls back for
    torch builds that predate the kwarg."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:
        return torch.load(path, map_location="cpu")


def convert_t5_from_hf(
    model_dir: Path, dtype=None
) -> Tuple[T5Config, Any]:
    """HF T5 encoder (e.g. Rostlab/prot_t5_xl_uniref50) → our pytree.

    HF stores projection weights as [out, in]; our einsums use [in, out],
    so every matrix is transposed on the way in.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    sd = _read_hf_state_dict(model_dir)
    cfg_file = Path(model_dir) / "config.json"
    hf = json.loads(cfg_file.read_text()) if cfg_file.exists() else {}
    config = T5Config(
        vocab_size=hf.get("vocab_size", 128),
        d_model=hf.get("d_model", 1024),
        d_kv=hf.get("d_kv", 128),
        d_ff=hf.get("d_ff", 16384),
        num_layers=hf.get("num_layers", 24),
        num_heads=hf.get("num_heads", 32),
        rel_buckets=hf.get("relative_attention_num_buckets", 32),
        rel_max_distance=hf.get("relative_attention_max_distance", 128),
        dtype=dtype,
    )

    def get(name):
        key = name if name in sd else f"encoder.{name}"
        return np.asarray(sd[key], dtype=np.float32)

    def w(name):  # transpose torch [out, in] → [in, out]
        return jnp.asarray(get(name).T, dtype=dtype)

    layers = []
    for i in range(config.num_layers):
        base = f"encoder.block.{i}"
        layers.append(
            {
                "attn": {
                    "ln": jnp.asarray(
                        get(f"{base}.layer.0.layer_norm.weight"), dtype=dtype
                    ),
                    "q": w(f"{base}.layer.0.SelfAttention.q.weight"),
                    "k": w(f"{base}.layer.0.SelfAttention.k.weight"),
                    "v": w(f"{base}.layer.0.SelfAttention.v.weight"),
                    "o": w(f"{base}.layer.0.SelfAttention.o.weight"),
                },
                "mlp": {
                    "ln": jnp.asarray(
                        get(f"{base}.layer.1.layer_norm.weight"), dtype=dtype
                    ),
                    "wi": w(f"{base}.layer.1.DenseReluDense.wi.weight"),
                    "wo": w(f"{base}.layer.1.DenseReluDense.wo.weight"),
                },
            }
        )
    params = {
        "embedding": jnp.asarray(get("shared.weight"), dtype=dtype),
        "rel_embedding": jnp.asarray(
            get(
                "encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"
            ),
            dtype=dtype,
        ),
        "layers": layers,
        "final_ln": jnp.asarray(
            get("encoder.final_layer_norm.weight"), dtype=dtype
        ),
    }
    return config, params


def load_t5_checkpoint(path: Path):
    """Load a converted .npz (or convert an HF directory in place).

    Returns (config, params, vocab): `vocab` is the residue→token-id table
    stored in the checkpoint's meta (key "vocab") when the source
    tokenizer's sentencepiece ordering differs from the published prot_t5
    layout, else None (callers fall back to t5.PROTT5_VOCAB)."""
    import jax
    import jax.numpy as jnp

    path = Path(path)
    if path.is_dir():
        config, params = convert_t5_from_hf(path)
        return config, params, None
    params, meta = load_params(path)
    config = T5Config(**{**meta.get("config", {}), "dtype": jnp.bfloat16})
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype=config.dtype), params)
    vocab = meta.get("vocab")
    if vocab is not None:
        vocab = {str(k): int(v) for k, v in vocab.items()}
    return config, params, vocab


# --- HF BERT (ProtBert-style) → BertConfig params --------------------------------


def convert_bert_from_hf(model_dir: Path, pre_norm: bool = False):
    """HF BertModel state dict (e.g. Rostlab/prot_bert_bfd) → models/bert.py
    pytree. HF stores Linear weights [out, in]; ours are [in, out]."""
    import jax.numpy as jnp

    from .bert import BertConfig

    sd = _read_hf_state_dict(model_dir)
    cfg_file = Path(model_dir) / "config.json"
    hf = json.loads(cfg_file.read_text()) if cfg_file.exists() else {}
    config = BertConfig(
        vocab_size=hf.get("vocab_size", 30),
        d_model=hf.get("hidden_size", 1024),
        d_ff=hf.get("intermediate_size", 4096),
        num_layers=hf.get("num_hidden_layers", 30),
        num_heads=hf.get("num_attention_heads", 16),
        max_positions=hf.get("max_position_embeddings", 40000),
        pre_norm=pre_norm,
        gelu_exact=hf.get("hidden_act", "gelu") == "gelu",
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
    )

    def has(name):
        return name in sd or f"bert.{name}" in sd

    def get(name):
        key = name if name in sd else f"bert.{name}"
        return np.asarray(sd[key], dtype=np.float32)

    def w(name):
        return jnp.asarray(get(name).T)

    def v(name):
        return jnp.asarray(get(name))

    layers = []
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}"
        layers.append(
            {
                "q": w(f"{base}.attention.self.query.weight"),
                "q_b": v(f"{base}.attention.self.query.bias"),
                "k": w(f"{base}.attention.self.key.weight"),
                "k_b": v(f"{base}.attention.self.key.bias"),
                "v": w(f"{base}.attention.self.value.weight"),
                "v_b": v(f"{base}.attention.self.value.bias"),
                "o": w(f"{base}.attention.output.dense.weight"),
                "o_b": v(f"{base}.attention.output.dense.bias"),
                "ln1": v(f"{base}.attention.output.LayerNorm.weight"),
                "ln1_b": v(f"{base}.attention.output.LayerNorm.bias"),
                "wi": w(f"{base}.intermediate.dense.weight"),
                "wi_b": v(f"{base}.intermediate.dense.bias"),
                "wo": w(f"{base}.output.dense.weight"),
                "wo_b": v(f"{base}.output.dense.bias"),
                "ln2": v(f"{base}.output.LayerNorm.weight"),
                "ln2_b": v(f"{base}.output.LayerNorm.bias"),
            }
        )
    params = {
        "embedding": v("embeddings.word_embeddings.weight"),
        "position_embedding": v("embeddings.position_embeddings.weight"),
        "emb_ln": v("embeddings.LayerNorm.weight"),
        "emb_ln_b": v("embeddings.LayerNorm.bias"),
        "layers": layers,
    }
    # HF adds token_type_embeddings[0] everywhere when token types are 0
    if has("embeddings.token_type_embeddings.weight"):
        params["token_type_row"] = v(
            "embeddings.token_type_embeddings.weight"
        )[0]
    return config, params


# --- HF tokenizer tables -----------------------------------------------------------


def read_hf_tokenizer_vocab(model_dir: Path):
    """Residue → token-id table from the tokenizer files of an HF
    checkpoint directory: tokenizer.json (fast tokenizers; BPE/WordPiece
    dict or unigram list) or vocab.txt (WordPiece). Only single-letter
    pieces are kept (the sentencepiece word-start marker ▁ is stripped),
    so special tokens keep their per-family constants. Returns None when
    no readable tokenizer file exists (e.g. a spiece.model-only checkpoint
    — sentencepiece is not installed here); callers then fall back to the
    documented default ordering, which MUST be verified against the real
    tokenizer before trusting embeddings.
    """
    model_dir = Path(model_dir)
    tj = model_dir / "tokenizer.json"
    if tj.exists():
        data = json.loads(tj.read_text())
        vocab = data.get("model", {}).get("vocab")
        table: Dict[str, int] = {}
        if isinstance(vocab, dict):  # BPE / WordPiece
            for tok, idx in vocab.items():
                t = tok.lstrip("▁")
                if len(t) == 1 and t.isalpha():
                    table.setdefault(t.upper(), int(idx))
        elif isinstance(vocab, list):  # unigram: [[piece, score], ...]
            for idx, item in enumerate(vocab):
                t = str(item[0]).lstrip("▁")
                if len(t) == 1 and t.isalpha():
                    table.setdefault(t.upper(), idx)
        if table:
            return table
    vt = model_dir / "vocab.txt"
    if vt.exists():
        table = {}
        for idx, line in enumerate(vt.read_text().splitlines()):
            tok = line.strip()
            if len(tok) == 1 and tok.isalpha():
                table.setdefault(tok.upper(), idx)
        return table or None
    return None


# --- HF ESM (ESM-1b) → BertConfig params ------------------------------------------


def convert_esm_from_hf(model_dir: Path):
    """HF EsmModel state dict (e.g. facebook/esm1b_t33_650M_UR50S) →
    models/bert.py pytree (pre-LN, learned positions offset by
    padding_idx+1=2; the reference truncates inputs to 1022 residues for
    this model, reference: cath/embed.py:80-82).

    Only position_embedding_type="absolute" (ESM-1b) converts; ESM-2's
    rotary attention is a different architecture.
    """
    import jax.numpy as jnp

    from .bert import BertConfig

    sd = _read_hf_state_dict(model_dir)
    cfg_file = Path(model_dir) / "config.json"
    hf = json.loads(cfg_file.read_text()) if cfg_file.exists() else {}
    if hf.get("position_embedding_type", "absolute") != "absolute":
        raise ValueError(
            "convert_esm_from_hf handles ESM-1b (absolute positions); "
            f"got position_embedding_type="
            f"{hf.get('position_embedding_type')!r} (ESM-2/rotary)"
        )
    config = BertConfig(
        vocab_size=hf.get("vocab_size", 33),
        d_model=hf.get("hidden_size", 1280),
        d_ff=hf.get("intermediate_size", 5120),
        num_layers=hf.get("num_hidden_layers", 33),
        num_heads=hf.get("num_attention_heads", 20),
        max_positions=hf.get("max_position_embeddings", 1026),
        pre_norm=True,
        gelu_exact=True,
        position_offset=hf.get("pad_token_id", 1) + 1,
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
    )

    def get(name):
        key = name if name in sd else f"esm.{name}"
        return np.asarray(sd[key], dtype=np.float32)

    def w(name):
        return jnp.asarray(get(name).T)

    def v(name):
        return jnp.asarray(get(name))

    layers = []
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}"
        layers.append(
            {
                "q": w(f"{base}.attention.self.query.weight"),
                "q_b": v(f"{base}.attention.self.query.bias"),
                "k": w(f"{base}.attention.self.key.weight"),
                "k_b": v(f"{base}.attention.self.key.bias"),
                "v": w(f"{base}.attention.self.value.weight"),
                "v_b": v(f"{base}.attention.self.value.bias"),
                "o": w(f"{base}.attention.output.dense.weight"),
                "o_b": v(f"{base}.attention.output.dense.bias"),
                # pre-LN: ln1 normalises the attention input,
                # ln2 the feed-forward input
                "ln1": v(f"{base}.attention.LayerNorm.weight"),
                "ln1_b": v(f"{base}.attention.LayerNorm.bias"),
                "wi": w(f"{base}.intermediate.dense.weight"),
                "wi_b": v(f"{base}.intermediate.dense.bias"),
                "wo": w(f"{base}.output.dense.weight"),
                "wo_b": v(f"{base}.output.dense.bias"),
                "ln2": v(f"{base}.LayerNorm.weight"),
                "ln2_b": v(f"{base}.LayerNorm.bias"),
            }
        )
    embedding = v("embeddings.word_embeddings.weight")
    if hf.get("token_dropout", False):
        # ESM-1b trains with mask-token dropout; at inference with no
        # <mask> in the input HF scales word embeddings by
        # (1 - 0.15*0.8) BEFORE adding positions — fold it into the table
        # (the position table is added after, so it must stay unscaled)
        embedding = embedding * (1.0 - 0.15 * 0.8)
    params = {
        "embedding": embedding,
        "position_embedding": v("embeddings.position_embeddings.weight"),
        "emb_ln": v("embeddings.layer_norm.weight"),
        "emb_ln_b": v("embeddings.layer_norm.bias"),
        "final_ln": v("encoder.emb_layer_norm_after.weight"),
        "final_ln_b": v("encoder.emb_layer_norm_after.bias"),
        "layers": layers,
    }
    return config, params


# --- HF ALBERT (ProtAlbert-BFD) → BertConfig params -------------------------------


def convert_albert_from_hf(model_dir: Path):
    """HF AlbertModel state dict (e.g. Rostlab/prot_albert) → models/bert.py
    pytree: one shared layer block + factorized-embedding projection
    (reference uses bio_embeddings' ProtTransAlbertBFDEmbedder,
    reference: cath/embed.py:17,39)."""
    import jax.numpy as jnp

    from .bert import BertConfig

    sd = _read_hf_state_dict(model_dir)
    cfg_file = Path(model_dir) / "config.json"
    hf = json.loads(cfg_file.read_text()) if cfg_file.exists() else {}
    config = BertConfig(
        vocab_size=hf.get("vocab_size", 30),
        d_model=hf.get("hidden_size", 4096),
        d_ff=hf.get("intermediate_size", 16384),
        num_layers=hf.get("num_hidden_layers", 12),
        num_heads=hf.get("num_attention_heads", 64),
        max_positions=hf.get("max_position_embeddings", 40000),
        pre_norm=False,
        share_layers=True,
        embed_dim=hf.get("embedding_size", 128),
        gelu_exact=hf.get("hidden_act", "gelu_new") == "gelu",
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
    )

    def get(name):
        key = name if name in sd else f"albert.{name}"
        return np.asarray(sd[key], dtype=np.float32)

    def w(name):
        return jnp.asarray(get(name).T)

    def v(name):
        return jnp.asarray(get(name))

    base = "encoder.albert_layer_groups.0.albert_layers.0"
    shared = {
        "q": w(f"{base}.attention.query.weight"),
        "q_b": v(f"{base}.attention.query.bias"),
        "k": w(f"{base}.attention.key.weight"),
        "k_b": v(f"{base}.attention.key.bias"),
        "v": w(f"{base}.attention.value.weight"),
        "v_b": v(f"{base}.attention.value.bias"),
        "o": w(f"{base}.attention.dense.weight"),
        "o_b": v(f"{base}.attention.dense.bias"),
        "ln1": v(f"{base}.attention.LayerNorm.weight"),
        "ln1_b": v(f"{base}.attention.LayerNorm.bias"),
        "wi": w(f"{base}.ffn.weight"),
        "wi_b": v(f"{base}.ffn.bias"),
        "wo": w(f"{base}.ffn_output.weight"),
        "wo_b": v(f"{base}.ffn_output.bias"),
        "ln2": v(f"{base}.full_layer_layer_norm.weight"),
        "ln2_b": v(f"{base}.full_layer_layer_norm.bias"),
    }
    params = {
        "embedding": v("embeddings.word_embeddings.weight"),
        "position_embedding": v("embeddings.position_embeddings.weight"),
        "token_type_row": v("embeddings.token_type_embeddings.weight")[0],
        "emb_ln": v("embeddings.LayerNorm.weight"),
        "emb_ln_b": v("embeddings.LayerNorm.bias"),
        "emb_proj": w("encoder.embedding_hidden_mapping_in.weight"),
        "emb_proj_b": v("encoder.embedding_hidden_mapping_in.bias"),
        "layers": [shared],
    }
    return config, params


# --- HF XLNet (ProtXLNet-UniRef100) → XLNetConfig params --------------------------


def convert_xlnet_from_hf(model_dir: Path):
    """HF XLNetModel state dict (e.g. Rostlab/prot_xlnet) → models/xlnet.py
    pytree (reference embeds via bio_embeddings' XLNet wrapper,
    reference: cath/embed.py:19,41).

    XLNet's attention projections are stored as [d_model, n_head, d_head]
    Parameters (not Linear modules), so they load WITHOUT transposition;
    only the feed-forward Linears flip [out, in] → [in, out].
    """
    import jax.numpy as jnp

    from .xlnet import XLNetConfig

    sd = _read_hf_state_dict(model_dir)
    cfg_file = Path(model_dir) / "config.json"
    hf = json.loads(cfg_file.read_text()) if cfg_file.exists() else {}
    config = XLNetConfig(
        vocab_size=hf.get("vocab_size", 37),
        d_model=hf.get("d_model", 1024),
        d_inner=hf.get("d_inner", 4096),
        num_layers=hf.get("n_layer", 30),
        num_heads=hf.get("n_head", 16),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
    )

    def get(name):
        key = name if name in sd else f"transformer.{name}"
        return np.asarray(sd[key], dtype=np.float32)

    def v(name):
        return jnp.asarray(get(name))

    def w(name):  # FF Linear: torch [out, in] → [in, out]
        return jnp.asarray(get(name).T)

    layers = []
    for i in range(config.num_layers):
        base = f"layer.{i}"
        layers.append(
            {
                "q": v(f"{base}.rel_attn.q"),
                "k": v(f"{base}.rel_attn.k"),
                "v": v(f"{base}.rel_attn.v"),
                "o": v(f"{base}.rel_attn.o"),
                "r": v(f"{base}.rel_attn.r"),
                "r_w_bias": v(f"{base}.rel_attn.r_w_bias"),
                "r_r_bias": v(f"{base}.rel_attn.r_r_bias"),
                "r_s_bias": v(f"{base}.rel_attn.r_s_bias"),
                "seg_embed": v(f"{base}.rel_attn.seg_embed"),
                "ln_attn": v(f"{base}.rel_attn.layer_norm.weight"),
                "ln_attn_b": v(f"{base}.rel_attn.layer_norm.bias"),
                "ff_w1": w(f"{base}.ff.layer_1.weight"),
                "ff_b1": v(f"{base}.ff.layer_1.bias"),
                "ff_w2": w(f"{base}.ff.layer_2.weight"),
                "ff_b2": v(f"{base}.ff.layer_2.bias"),
                "ln_ff": v(f"{base}.ff.layer_norm.weight"),
                "ln_ff_b": v(f"{base}.ff.layer_norm.bias"),
            }
        )
    params = {
        "embedding": v("word_embedding.weight"),
        "layers": layers,
    }
    return config, params


# --- CPCProt (torch conv encoder + GRU) → CPCProtConfig params --------------------


def convert_cpcprot_from_torch(
    path: Path,
    embed_key: str = "encoder.embedding.weight",
    gru_prefix: str = "autoregressor.",
    patch_len: int = 11,
):
    """Torch CPCProt checkpoint → models/cpcprot.py pytree (reference
    embeds via bio_embeddings' CPCProtEmbedder,
    reference: cath/embed.py:13,35).

    The conv stack is introspected: every 3-d tensor under `encoder.`
    (torch Conv1d weight [out, in, k], sorted by key) becomes one conv
    layer, transposed to [k, in, out]; the GRU loads with torch's gate
    packing [r|z|n], biases kept separate because torch applies the reset
    gate to (W_hn h + b_hn).
    """
    import jax.numpy as jnp

    from .cpcprot import CPCProtConfig

    path = Path(path)
    if path.is_dir():
        sd = _read_hf_state_dict(path)
    else:
        sd = {
            k: v.float().numpy() for k, v in _torch_load(path).items()
        }

    def get(name):
        return np.asarray(sd[name], dtype=np.float32)

    embedding = get(embed_key)

    def natural(key):  # conv10 must sort after conv2
        return [
            int(part) if part.isdigit() else part
            for part in re.split(r"(\d+)", key)
        ]

    conv_keys = sorted(
        (
            k for k, v in sd.items()
            if k.startswith("encoder.") and k.endswith(".weight")
            and np.ndim(sd[k]) == 3
        ),
        key=natural,
    )
    convs, spec = [], []
    for key in conv_keys:
        w = get(key)  # [out, in, k]
        b = get(key[: -len(".weight")] + ".bias")
        convs.append(
            {"w": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)}
        )
        spec.append((w.shape[0], w.shape[2]))
    w_ih = get(f"{gru_prefix}weight_ih_l0")  # [3c, z]
    w_hh = get(f"{gru_prefix}weight_hh_l0")
    config = CPCProtConfig(
        vocab_size=embedding.shape[0],
        embed_dim=embedding.shape[1],
        patch_len=patch_len,
        conv_spec=tuple(spec),
        z_dim=w_ih.shape[1],
        c_dim=w_hh.shape[1],
    )
    params = {
        "embedding": jnp.asarray(embedding),
        "convs": convs,
        "gru": {
            "w_x": jnp.asarray(w_ih.T),
            "w_h": jnp.asarray(w_hh.T),
            "b_x": jnp.asarray(get(f"{gru_prefix}bias_ih_l0")),
            "b_h": jnp.asarray(get(f"{gru_prefix}bias_hh_l0")),
        },
    }
    return config, params


# --- PLUS-RNN (torch biLSTM) → PlusRnnConfig params -------------------------------


def convert_plus_rnn_from_torch(
    path: Path, embed_key: str = "embed.weight", prefix: str = "rnn."
):
    """Torch PLUS-RNN checkpoint (embedding + bidirectional nn.LSTM) →
    models/plus_rnn.py pytree (reference embeds via bio_embeddings'
    PLUSRNNEmbedder, reference: cath/embed.py:16,38).

    Dimensions are introspected from tensor shapes, so any PLUS-RNN size
    loads; torch packs gates [i|f|g|o] along the first axis of
    weight_ih/weight_hh [4h, in] — transposed here, with the two bias
    vectors summed (torch applies b_ih + b_hh every step).
    """
    import jax.numpy as jnp

    from .plus_rnn import PlusRnnConfig

    path = Path(path)
    if path.is_dir():
        sd = _read_hf_state_dict(path)
    else:
        sd = {
            k: v.float().numpy() for k, v in _torch_load(path).items()
        }

    def get(name):
        return np.asarray(sd[name], dtype=np.float32)

    embedding = get(embed_key)
    num_layers = sum(
        1 for k in sd if k.startswith(f"{prefix}weight_ih_l")
        and not k.endswith("_reverse")
    )
    hidden = get(f"{prefix}weight_hh_l0").shape[1]
    config = PlusRnnConfig(
        vocab_size=embedding.shape[0],
        embed_dim=embedding.shape[1],
        hidden_dim=hidden,
        num_layers=num_layers,
    )

    def cell(layer, rev):
        sfx = f"l{layer}" + ("_reverse" if rev else "")
        return {
            "w_x": jnp.asarray(get(f"{prefix}weight_ih_{sfx}").T),
            "w_h": jnp.asarray(get(f"{prefix}weight_hh_{sfx}").T),
            "b": jnp.asarray(
                get(f"{prefix}bias_ih_{sfx}") + get(f"{prefix}bias_hh_{sfx}")
            ),
        }

    params = {
        "embedding": jnp.asarray(embedding),
        "fwd": [cell(i, False) for i in range(num_layers)],
        "bwd": [cell(i, True) for i in range(num_layers)],
    }
    return config, params


# --- SeqVec ELMo (bilm-tf hdf5) → ELMo params -----------------------------------


def convert_elmo_from_hdf5(weights_file: Path, options_file: Path):
    """bilm-tf weights.hdf5 → our pytree.

    Conventions handled on the way in:
      * gate order: bilm-tf stores [input, cell, forget, output]; ours is
        [input, forget, cell, output] — columns permuted.
      * forget bias: TF's LSTMCell(forget_bias=1.0) adds +1 to the f gate at
        RUNTIME; the dumped B tensor does not contain it, so +1 is added to
        the forget block here (AllenNLP's converter does the same).
      * highway gate: bilm-tf computes y = g·relu(W_tr·x) + (1−g)·x with
        g = sigmoid(W_carry·x + b_carry) — the gate multiplies the TRANSFORM
        branch despite the "carry" name (AllenNLP's converter comment: "tf
        is (1 - g) * x + g * f(x)"; AllenNLP negates only because ITS gate
        multiplies x). Our highway (models/elmo.py) also gates the relu
        branch, so W_carry/b_carry load verbatim: no negation, and TF
        kernels are already [in, out] so no transpose either.
    """
    import h5py
    import jax.numpy as jnp

    from .elmo import ElmoConfig

    options = json.loads(Path(options_file).read_text())
    cnn = options["char_cnn"]
    lstm = options["lstm"]
    config = ElmoConfig(
        char_embed_dim=cnn["embedding"]["dim"],
        filters=tuple(tuple(f) for f in cnn["filters"]),
        n_highway=cnn["n_highway"],
        proj_dim=lstm["projection_dim"],
        lstm_dim=lstm["dim"],
        n_lstm_layers=lstm["n_layers"],
        cell_clip=lstm.get("cell_clip", 3.0),
        proj_clip=lstm.get("proj_clip", 3.0),
    )

    def reorder_gates(w, hidden):
        # [.., 4H] bilm order i,g,f,o → ours i,f,g,o
        i, g, f, o = np.split(w, 4, axis=-1)
        return np.concatenate([i, f, g, o], axis=-1)

    with h5py.File(weights_file, "r") as fp:
        params = {
            "char_embedding": jnp.asarray(
                np.asarray(fp["char_embed"], dtype=np.float32)
            ),
            "convs": [
                {
                    "w": jnp.asarray(
                        np.asarray(fp[f"CNN/W_cnn_{i}"], dtype=np.float32)[0]
                    ),
                    "b": jnp.asarray(
                        np.asarray(fp[f"CNN/b_cnn_{i}"], dtype=np.float32)
                    ),
                }
                for i in range(len(config.filters))
            ],
            "highways": [
                {
                    # gate loads verbatim (see docstring); square matrices —
                    # a wrong transpose/negation would not shape-error
                    "w_gate": jnp.asarray(
                        np.asarray(
                            fp[f"CNN_high_{i}/W_carry"], dtype=np.float32
                        )
                    ),
                    "b_gate": jnp.asarray(
                        np.asarray(fp[f"CNN_high_{i}/b_carry"], dtype=np.float32)
                    ),
                    "w_lin": jnp.asarray(
                        np.asarray(
                            fp[f"CNN_high_{i}/W_transform"], dtype=np.float32
                        )
                    ),
                    "b_lin": jnp.asarray(
                        np.asarray(fp[f"CNN_high_{i}/b_transform"], dtype=np.float32)
                    ),
                }
                for i in range(config.n_highway)
            ],
            "proj_w": jnp.asarray(
                np.asarray(fp["CNN_proj/W_proj"], dtype=np.float32)
            ),
            "proj_b": jnp.asarray(
                np.asarray(fp["CNN_proj/b_proj"], dtype=np.float32)
            ),
        }
        for direction, name in [("lstm_fwd", "RNN_0"), ("lstm_bwd", "RNN_1")]:
            cells = []
            for layer in range(config.n_lstm_layers):
                base = f"{name}/RNN/MultiRNNCell/Cell{layer}/LSTMCell"
                w = np.asarray(fp[f"{base}/W_0"], dtype=np.float32)
                b = np.asarray(fp[f"{base}/B"], dtype=np.float32)
                proj = np.asarray(fp[f"{base}/W_P_0"], dtype=np.float32)
                in_dim = w.shape[0] - config.proj_dim
                bias = reorder_gates(b, config.lstm_dim)
                # TF LSTMCell adds forget_bias=1.0 at runtime, not in B
                h = config.lstm_dim
                bias = bias.copy()
                bias[h : 2 * h] += 1.0
                cells.append(
                    {
                        "w_x": jnp.asarray(
                            reorder_gates(w[:in_dim], config.lstm_dim)
                        ),
                        "w_h": jnp.asarray(
                            reorder_gates(w[in_dim:], config.lstm_dim)
                        ),
                        "b": jnp.asarray(bias),
                        "w_proj": jnp.asarray(proj),
                    }
                )
            params[direction] = cells
    return config, params


# --- UniRep (churchlab babbler-1900 npy dump / jax-unirep npz) -------------------


def convert_unirep_from_npy(path: Path):
    """churchlab/UniRep weight dump → models/unirep.py pytree (the reference
    embeds UniRep through bio_embeddings → jax-unirep,
    reference: cath/embed.py:34-46).

    Accepted layouts:
      * a directory of per-tensor ``.npy`` files with the original TF
        variable names (``embed_matrix:0.npy``, ``rnn_mlstm_mlstm_wx:0.npy``,
        …) — the published 1900_weights download; ``:0``-less names load too
      * a single ``.npz`` with the same tensor names (any of the prefixes
        stripped)

    Conventions handled on the way in:
      * weight normalisation: the TF graph stores direction tensors plus
        gain vectors (gx/gh/gmx/gmh) and applies
        ``W_eff[:, j] = g[j] · W[:, j] / ‖W[:, j]‖₂`` at runtime
        (jax-unirep does the same in its mLSTM step). The gains are fused
        into the weights here, which is mathematically identical and keeps
        the device step gain-free. Dumps without gain tensors are assumed
        pre-fused and load verbatim.
      * gate order: [i, f, o, u] with ``c' = σ(f)c + σ(i)tanh(u)``,
        ``h' = σ(o)tanh(c')`` — identical in the TF graph, jax-unirep, and
        models/unirep.py, so gate columns load unpermuted.
    """
    import jax.numpy as jnp

    from .unirep import UniRepConfig

    path = Path(path)
    if path.is_dir():
        tensors = {
            f.name[: -len(".npy")]: np.load(f).astype(np.float32)
            for f in path.glob("*.npy")
        }
    else:
        with np.load(path) as npz:
            tensors = {k: npz[k].astype(np.float32) for k in npz.files}

    def get(*names):
        for name in names:
            for key in (name, name + ":0", "rnn_mlstm_mlstm_" + name,
                        "rnn_mlstm_mlstm_" + name + ":0"):
                if key in tensors:
                    return tensors[key]
        return None

    def need(*names):
        t = get(*names)
        if t is None:
            raise KeyError(
                f"UniRep checkpoint {path} is missing {names[0]} "
                f"(has: {sorted(tensors)})"
            )
        return t

    def weight_norm(w, gain):
        if gain is None:
            return w
        norm = np.linalg.norm(w, axis=0, keepdims=True)
        return w / np.maximum(norm, 1e-12) * gain[None, :]

    embedding = need("embed_matrix", "embedding")
    wx = weight_norm(need("wx"), get("gx"))
    wh = weight_norm(need("wh"), get("gh"))
    wmx = weight_norm(need("wmx"), get("gmx"))
    wmh = weight_norm(need("wmh"), get("gmh"))
    b = need("b")
    config = UniRepConfig(
        vocab_size=embedding.shape[0],
        embed_dim=embedding.shape[1],
        hidden_dim=wmh.shape[1],
    )
    params = {
        "embedding": jnp.asarray(embedding),
        "wmx": jnp.asarray(wmx),
        "wmh": jnp.asarray(wmh),
        "wx": jnp.asarray(wx),
        "wh": jnp.asarray(wh),
        "b": jnp.asarray(b),
    }
    return config, params


def load_unirep_checkpoint(path: Path):
    """Flat-npz (save_params) or churchlab npy-dir / raw-npz UniRep weights."""
    from .unirep import UniRepConfig

    path = Path(path)
    if path.is_dir():
        return convert_unirep_from_npy(path)
    with np.load(path, allow_pickle=False) as npz:
        ours = "wmx" in npz.files  # save_params layout vs raw TF names
    if not ours:
        return convert_unirep_from_npy(path)
    params, meta = load_params(path)
    cfg = meta.get("config", {})
    return (UniRepConfig(**cfg) if cfg else UniRepConfig()), params


def load_elmo_checkpoint(path: Path):
    path = Path(path)
    if path.is_dir():
        return convert_elmo_from_hdf5(
            path / "weights.hdf5", path / "options.json"
        )
    params, meta = load_params(path)
    from .elmo import ElmoConfig

    cfg = meta.get("config", {})
    if "filters" in cfg:
        cfg["filters"] = tuple(tuple(f) for f in cfg["filters"])
    return ElmoConfig(**cfg), params
