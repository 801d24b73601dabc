"""Embedder registry — the model layer's public face.

Mirrors the reference's embedder-by-name registry
(reference: cath/embed.py:34-46) with a uniform interface:

  embed_per_residue(sequences) → iterator of [L_i, d] arrays
  embed_pooled(sequences)      → [N, d] mean-pooled vectors
  reduce_per_protein(emb)      → mean over residues

Native JAX encoders (checkpoints via models/convert.py): ProtT5 family
(models/t5.py), SeqVec/ELMo (models/elmo.py, 4 layer variants exposed
like reference: cath/embed.py:100-105), ESM/ESM1b/ProtBert/ProtAlbert
(models/bert.py), ProtXLNet (models/xlnet.py), UniRep (models/unirep.py),
PLUS-RNN (models/plus_rnn.py), CPCProt (models/cpcprot.py), and the
AA-composition numpy baseline (reference: cath/embed_all.py:23-44) — all
11 reference embedders. Registry names match the
reference so CATH pipeline outputs keep their file names. Embedders whose
checkpoints are not installed raise a clear error at construction, not at
import (the reference isolates embedder crashes with subprocesses —
reference: cath/embed_all.py:1-11; we fail fast instead and let the
pipeline's try/except skip them the same way).
"""

from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_TOKEN_BATCH, MAX_SEQ_LEN
from . import bert, cpcprot, elmo, plus_rnn, t5, unirep, xlnet
from .batching import Batch, make_batches, pad_tokens
from .pooling import l2_then_mean_pool_jit, mean_pool_jit


class EmbedderBase:
    name: str = "base"
    dim: int = 0

    def embed_per_residue(
        self, sequences: Sequence[str]
    ) -> Iterator[np.ndarray]:
        raise NotImplementedError

    @staticmethod
    def reduce_per_protein(per_residue: np.ndarray) -> np.ndarray:
        """Mean over the residue axis (reference: cath/embed.py:91-94)."""
        return np.asarray(per_residue, dtype=np.float32).mean(axis=0)

    def embed_pooled(self, sequences: Sequence[str]) -> np.ndarray:
        if not sequences:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack(
            [self.reduce_per_protein(e) for e in self.embed_per_residue(sequences)]
        )


class ProtT5Embedder(EmbedderBase):
    """JAX ProtT5 encoder with token-budget batching + optional L2 pooling
    variant (reference: pfam/embed_t5_fp16.py, pfam/embed_t5_l2.py:69-71)."""

    name = "ProtT5 XL U50"
    dim = 1024

    def __init__(
        self,
        checkpoint: Optional[Path] = None,
        config: Optional[t5.T5Config] = None,
        params=None,
        token_budget: int = DEFAULT_TOKEN_BATCH,
        max_len: int = MAX_SEQ_LEN,
        l2_per_residue: bool = False,
    ):
        self.vocab = None  # default = published prot_t5 layout
        if params is not None:
            self.config = config or t5.PROTT5_XL
            self.params = params
        elif checkpoint is not None:
            from .convert import load_t5_checkpoint

            self.config, self.params, self.vocab = load_t5_checkpoint(
                checkpoint
            )
        else:
            raise ValueError(
                f"{self.name}: no checkpoint installed — pass `checkpoint=` "
                "(converted via models/convert.py) or explicit params"
            )
        self.dim = self.config.d_model
        self.token_budget = token_budget
        self.max_len = max_len
        self.l2_per_residue = l2_per_residue

    def _run_batch(self, batch: Batch) -> List[np.ndarray]:
        tokens = [t5.tokenize(s, self.vocab) for s in batch.sequences]
        ids, mask = pad_tokens(tokens, batch.padded_len, t5.PAD_ID)
        hidden = t5.encode_jit(
            self.params, jnp.asarray(ids), jnp.asarray(mask), self.config
        )
        hidden = np.asarray(hidden, dtype=np.float32)
        outs = []
        for row, seq in enumerate(batch.sequences):
            outs.append(hidden[row, : len(seq)])  # drop EOS + padding
        return outs

    def embed_per_residue(self, sequences):
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for batch in make_batches(sequences, self.token_budget, self.max_len):
            for idx, out in zip(batch.indices, self._run_batch(batch)):
                results[idx] = out
        yield from results

    def embed_pooled(self, sequences: Sequence[str]) -> np.ndarray:
        """Pooled on device (masked mean; L2 variant normalises first)."""
        if not sequences:
            return np.zeros((0, self.dim), dtype=np.float32)
        pool = l2_then_mean_pool_jit if self.l2_per_residue else mean_pool_jit
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for batch in make_batches(sequences, self.token_budget, self.max_len):
            tokens = [t5.tokenize(s, self.vocab) for s in batch.sequences]
            ids, mask = pad_tokens(tokens, batch.padded_len, t5.PAD_ID)
            # mask out EOS for pooling: pool over residues only
            res_mask = mask.copy()
            for row, seq in enumerate(batch.sequences):
                res_mask[row, len(seq) :] = False
            hidden = t5.encode_jit(
                self.params, jnp.asarray(ids), jnp.asarray(mask), self.config
            )
            pooled = np.asarray(pool(hidden, jnp.asarray(res_mask)))
            for idx, row in zip(batch.indices, range(len(batch.sequences))):
                results[idx] = pooled[row]
        return np.stack(results)


class SeqVecEmbedder(EmbedderBase):
    """JAX ELMo; per-residue output is [3, L, 1024] like the reference's
    SeqVec (layers then exposed as Sum/CharCNN/LSTM1/LSTM2,
    reference: cath/embed.py:100-105)."""

    name = "SeqVec"
    dim = 1024

    def __init__(
        self,
        checkpoint: Optional[Path] = None,
        config: Optional[elmo.ElmoConfig] = None,
        params=None,
        max_batch_tokens: int = 16384,
    ):
        if params is not None:
            self.config = config or elmo.SEQVEC
            self.params = params
        elif checkpoint is not None:
            from .convert import load_elmo_checkpoint

            self.config, self.params = load_elmo_checkpoint(checkpoint)
        else:
            raise ValueError(
                f"{self.name}: no checkpoint installed — pass `checkpoint=` "
                "(converted via models/convert.py) or explicit params"
            )
        self.dim = 2 * self.config.proj_dim
        self.max_batch_tokens = max_batch_tokens

    def embed_per_residue(self, sequences):
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for batch in make_batches(
            sequences, self.max_batch_tokens, max_len=10**9, bucket=32
        ):
            tokens = [elmo.tokenize(s) for s in batch.sequences]
            ids, mask = pad_tokens(tokens, batch.padded_len, 0)
            layers = np.asarray(
                elmo.encode_jit(
                    self.params, jnp.asarray(ids), jnp.asarray(mask), self.config
                ),
                dtype=np.float32,
            )  # [3, B, L, 2p]
            for idx, row, seq in zip(
                batch.indices, range(len(batch.sequences)), batch.sequences
            ):
                results[idx] = layers[:, row, : len(seq)]
        yield from results

    @staticmethod
    def reduce_per_protein(per_residue: np.ndarray) -> np.ndarray:
        """SeqVec reduce: sum layers, mean residues (bio_embeddings)."""
        return np.asarray(per_residue, dtype=np.float32).sum(0).mean(0)

    def embed_layer_variants(
        self, sequences: Sequence[str]
    ) -> Dict[str, np.ndarray]:
        """The reference's 4 saved variants (cath/embed.py:100-105):
        per-protein means of each layer, plus their sum."""
        per_layer = []  # [N, 3, d]
        for emb in self.embed_per_residue(sequences):
            per_layer.append(emb.mean(axis=1))  # mean over residues per layer
        arr = np.stack(per_layer)
        return {
            "SeqVec Sum": arr.sum(axis=1),
            "SeqVec CharCNN": arr[:, 0],
            "SeqVec LSTM1": arr[:, 1],
            "SeqVec LSTM2": arr[:, 2],
        }


class BertEmbedder(EmbedderBase):
    """BERT-family pLMs: ESM / ESM1b (pre-LN, 1022-aa truncation,
    reference: cath/embed.py:80-82), ProtBert-BFD (post-LN), ProtAlbert-BFD
    (post-LN, shared layers). One encoder (models/bert.py), different
    configs + converted checkpoints."""

    name = "ESM1b"
    ARCHES = {
        "ESM1b": bert.ESM1B,
        "ESM": bert.ESM1B,
        "ProtBert BFD": bert.PROTBERT,
        "ProtAlbert BFD": bert.PROTALBERT,
    }

    def __init__(
        self,
        arch: str = "ESM1b",
        checkpoint: Optional[Path] = None,
        config: Optional[bert.BertConfig] = None,
        params=None,
        token_budget: int = DEFAULT_TOKEN_BATCH,
    ):
        self.name = arch
        self.vocab = None  # None = documented per-family default table
        if params is not None:
            self.config = config or self.ARCHES[arch]
            self.params = params
        elif checkpoint is not None:
            if Path(checkpoint).is_dir():  # HF checkpoint: convert in place
                from . import convert

                converter = {
                    "ESM": convert.convert_esm_from_hf,
                    "ESM1b": convert.convert_esm_from_hf,
                    "ProtBert BFD": convert.convert_bert_from_hf,
                    "ProtAlbert BFD": convert.convert_albert_from_hf,
                }[arch]
                self.config, self.params = converter(Path(checkpoint))
                self.vocab = convert.read_hf_tokenizer_vocab(Path(checkpoint))
            else:
                from .convert import load_params

                loaded, meta = load_params(checkpoint)
                cfg = meta.get("config", {})
                self.config = (
                    bert.BertConfig(**cfg) if cfg else self.ARCHES[arch]
                )
                self.params = loaded
                vocab = meta.get("vocab")
                if vocab is not None:
                    self.vocab = {str(k): int(v) for k, v in vocab.items()}
        else:
            raise ValueError(
                f"{arch}: no checkpoint installed — pass `checkpoint=` "
                "(converted via models/convert.py) or explicit params"
            )
        self.dim = self.config.d_model
        self.token_budget = token_budget
        # learned positions cap the usable token count (cls + residues + eos)
        usable = self.config.max_positions - self.config.position_offset
        self.max_len = usable - 2
        # each arch family has its own vocabulary + special ids
        if arch in ("ESM", "ESM1b"):
            self._tokenize = bert.tokenize_esm
            self._pad_id = bert.ESM_PAD
        else:  # ProtBert / ProtAlbert (BERT WordPiece layout)
            self._tokenize = bert.tokenize_bert
            self._pad_id = bert.BERT_PAD

    def embed_per_residue(self, sequences):
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        usable = self.config.max_positions - self.config.position_offset
        bucket = min(128, usable)
        for batch in make_batches(
            sequences, self.token_budget, self.max_len, bucket=bucket
        ):
            tokens = [
                self._tokenize(s, self.max_len, self.vocab)
                for s in batch.sequences
            ]
            # learned positions cap the padded length
            target = min(batch.padded_len + 2, usable)
            ids, mask = pad_tokens(tokens, target, self._pad_id)
            hidden = np.asarray(
                bert.encode_jit(
                    self.params, jnp.asarray(ids), jnp.asarray(mask), self.config
                ),
                dtype=np.float32,
            )
            for idx, row, seq in zip(
                batch.indices, range(len(batch.sequences)), batch.sequences
            ):
                # drop <cls> and <eos>
                results[idx] = hidden[row, 1 : 1 + min(len(seq), self.max_len)]
        yield from results


class UniRepEmbedder(EmbedderBase):
    """UniRep babbler-1900 mLSTM (models/unirep.py)."""

    name = "UniRep"

    def __init__(
        self,
        checkpoint: Optional[Path] = None,
        config: Optional[unirep.UniRepConfig] = None,
        params=None,
        token_budget: int = DEFAULT_TOKEN_BATCH,
    ):
        if params is not None:
            self.config = config or unirep.UNIREP
            self.params = params
        elif checkpoint is not None:
            # flat npz (save_params) or a churchlab npy-dir / raw TF npz,
            # converted in place (weight-norm gains fused)
            from .convert import load_unirep_checkpoint

            self.config, self.params = load_unirep_checkpoint(checkpoint)
        else:
            raise ValueError(
                "UniRep: no checkpoint installed — pass `checkpoint=` or params"
            )
        self.dim = self.config.hidden_dim
        self.token_budget = token_budget

    def embed_per_residue(self, sequences):
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for batch in make_batches(sequences, self.token_budget, 10**9):
            tokens = [unirep.tokenize(s) for s in batch.sequences]
            ids, mask = pad_tokens(tokens, batch.padded_len + 1, unirep.UNIREP_PAD)
            hidden = np.asarray(
                unirep.encode_jit(
                    self.params, jnp.asarray(ids), jnp.asarray(mask), self.config
                ),
                dtype=np.float32,
            )
            for idx, row, seq in zip(
                batch.indices, range(len(batch.sequences)), batch.sequences
            ):
                results[idx] = hidden[row, 1 : 1 + len(seq)]  # drop <start>
        yield from results


class XLNetEmbedder(EmbedderBase):
    """ProtXLNet-UniRef100 (models/xlnet.py): Transformer-XL relative
    attention; specials (<sep> <cls>) sit at the END, so per-residue output
    is the first len(seq) positions."""

    name = "ProtXLNet UniRef100"

    def __init__(
        self,
        checkpoint: Optional[Path] = None,
        config: Optional[xlnet.XLNetConfig] = None,
        params=None,
        token_budget: int = DEFAULT_TOKEN_BATCH,
        max_len: int = MAX_SEQ_LEN,
    ):
        self.vocab = None  # default = documented ProtTrans residue order
        if params is not None:
            self.config = config or xlnet.PROTXLNET
            self.params = params
        elif checkpoint is not None:
            if Path(checkpoint).is_dir():  # HF checkpoint: convert in place
                from .convert import (
                    convert_xlnet_from_hf,
                    read_hf_tokenizer_vocab,
                )

                self.config, self.params = convert_xlnet_from_hf(
                    Path(checkpoint)
                )
                self.vocab = read_hf_tokenizer_vocab(Path(checkpoint))
            else:
                from .convert import load_params

                loaded, meta = load_params(checkpoint)
                cfg = meta.get("config", {})
                self.config = (
                    xlnet.XLNetConfig(**cfg) if cfg else xlnet.PROTXLNET
                )
                self.params = loaded
                vocab = meta.get("vocab")
                if vocab is not None:
                    self.vocab = {str(k): int(v) for k, v in vocab.items()}
        else:
            raise ValueError(
                f"{self.name}: no checkpoint installed — pass `checkpoint=` "
                "(converted via models/convert.py) or explicit params"
            )
        self.dim = self.config.d_model
        self.token_budget = token_budget
        self.max_len = max_len

    def embed_per_residue(self, sequences):
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for batch in make_batches(sequences, self.token_budget, self.max_len):
            tokens = [
                xlnet.tokenize(s, self.vocab) for s in batch.sequences
            ]
            ids, mask = pad_tokens(
                tokens, batch.padded_len + 2, xlnet.XLNET_PAD
            )
            hidden = np.asarray(
                xlnet.encode_jit(
                    self.params, jnp.asarray(ids), jnp.asarray(mask),
                    self.config,
                ),
                dtype=np.float32,
            )
            for idx, row, seq in zip(
                batch.indices, range(len(batch.sequences)), batch.sequences
            ):
                results[idx] = hidden[row, : len(seq)]  # drop <sep> <cls>
        yield from results


class PlusRnnEmbedder(EmbedderBase):
    """PLUS-RNN bidirectional LSTM (models/plus_rnn.py); per-residue output
    is the concatenated fwd/bwd hidden state (2 x hidden_dim)."""

    name = "PLUS"

    def __init__(
        self,
        checkpoint: Optional[Path] = None,
        config: Optional[plus_rnn.PlusRnnConfig] = None,
        params=None,
        token_budget: int = DEFAULT_TOKEN_BATCH,
    ):
        self.vocab = None
        if params is not None:
            self.config = config or plus_rnn.PLUS_RNN
            self.params = params
        elif checkpoint is not None:
            from .convert import convert_plus_rnn_from_torch, load_params

            path = Path(checkpoint)
            if path.is_dir() or path.suffix in (".pt", ".bin"):
                self.config, self.params = convert_plus_rnn_from_torch(path)
            else:
                loaded, meta = load_params(path)
                cfg = meta.get("config", {})
                self.config = (
                    plus_rnn.PlusRnnConfig(**cfg) if cfg else plus_rnn.PLUS_RNN
                )
                self.params = loaded
                vocab = meta.get("vocab")
                if vocab is not None:
                    self.vocab = {str(k): int(v) for k, v in vocab.items()}
        else:
            raise ValueError(
                f"{self.name}: no checkpoint installed — pass `checkpoint=` "
                "(converted via models/convert.py) or explicit params"
            )
        self.dim = 2 * self.config.hidden_dim
        self.token_budget = token_budget

    def embed_per_residue(self, sequences):
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for batch in make_batches(sequences, self.token_budget, 10**9):
            tokens = [
                plus_rnn.tokenize(s, self.vocab) for s in batch.sequences
            ]
            ids, mask = pad_tokens(tokens, batch.padded_len, 0)
            hidden = np.asarray(
                plus_rnn.encode_jit(
                    self.params, jnp.asarray(ids), jnp.asarray(mask),
                    self.config,
                ),
                dtype=np.float32,
            )
            for idx, row, seq in zip(
                batch.indices, range(len(batch.sequences)), batch.sequences
            ):
                results[idx] = hidden[row, : len(seq)]
        yield from results


class CPCProtEmbedder(EmbedderBase):
    """CPCProt (models/cpcprot.py): the sequence is patched (11 residues a
    patch); "per-residue" output is the per-PATCH z matrix [n_patches,
    z_dim], and reduce_per_protein is its mean (z_mean) — the embedding the
    reference consumes. Patch counts vary, so sequences are grouped by
    bucketed patch count to bound recompilation."""

    name = "CPCProt"

    def __init__(
        self,
        checkpoint: Optional[Path] = None,
        config: Optional[cpcprot.CPCProtConfig] = None,
        params=None,
        batch_size: int = 64,
    ):
        self.vocab = None
        if params is not None:
            self.config = config or cpcprot.CPCPROT
            self.params = params
        elif checkpoint is not None:
            from .convert import convert_cpcprot_from_torch, load_params

            path = Path(checkpoint)
            if path.is_dir() or path.suffix in (".pt", ".bin"):
                self.config, self.params = convert_cpcprot_from_torch(path)
            else:
                loaded, meta = load_params(path)
                cfg = meta.get("config", {})
                if cfg and "conv_spec" in cfg:
                    cfg["conv_spec"] = tuple(
                        tuple(int(x) for x in layer)
                        for layer in cfg["conv_spec"]
                    )
                self.config = (
                    cpcprot.CPCProtConfig(**cfg) if cfg else cpcprot.CPCPROT
                )
                self.params = loaded
                vocab = meta.get("vocab")
                if vocab is not None:
                    self.vocab = {str(k): int(v) for k, v in vocab.items()}
        else:
            raise ValueError(
                f"{self.name}: no checkpoint installed — pass `checkpoint=` "
                "(converted via models/convert.py) or explicit params"
            )
        self.dim = self.config.z_dim
        self.batch_size = batch_size

    def embed_per_residue(self, sequences):
        patched = [
            cpcprot.tokenize_patches(s, self.config, self.vocab)
            for s in sequences
        ]
        order = sorted(range(len(patched)), key=lambda i: len(patched[i]))
        results: List[Optional[np.ndarray]] = [None] * len(sequences)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            t_max = max(len(patched[i]) for i in chunk)
            t_pad = -(-t_max // 4) * 4  # bucket to multiples of 4
            ids = np.zeros(
                (len(chunk), t_pad, self.config.patch_len), dtype=np.int32
            )
            for row, i in enumerate(chunk):
                ids[row, : len(patched[i])] = patched[i]
            z, _ = cpcprot.encode_jit(self.params, jnp.asarray(ids), self.config)
            z = np.asarray(z, dtype=np.float32)
            for row, i in enumerate(chunk):
                results[i] = z[row, : len(patched[i])]
        yield from results


class AACompositionEmbedder(EmbedderBase):
    """Amino-acid-composition baseline (reference: cath/embed_all.py:23-44).

    The reference derives the alphabet from its single combined fasta; a
    per-call alphabet would put train and test (embedded in separate CLI
    invocations) into incompatible vector spaces, so the default here is
    the fixed 25-letter extended alphabet. Unknown characters map to 'X'.
    """

    name = "AA Composition"
    DEFAULT_ALPHABET = "ABCDEFGHIKLMNOPQRSTUVWXYZ"  # sorted, stable

    def __init__(self, alphabet: Optional[str] = None):
        self.alphabet = alphabet or self.DEFAULT_ALPHABET

    def _table(self):
        table = {aa: i for i, aa in enumerate(self.alphabet)}
        fallback = table.get("X", 0)
        return table, fallback

    def embed_pooled(self, sequences: Sequence[str]) -> np.ndarray:
        table, fallback = self._table()
        out = np.zeros((len(sequences), len(self.alphabet)), dtype=np.float32)
        for row, seq in enumerate(sequences):
            for aa in seq.upper():
                out[row, table.get(aa, fallback)] += 1.0
            out[row] /= max(len(seq), 1)
        return out

    def embed_per_residue(self, sequences):
        table, fallback = self._table()
        eye = np.eye(len(self.alphabet), dtype=np.float32)
        for seq in sequences:
            yield np.stack([eye[table.get(aa, fallback)] for aa in seq.upper()])


import functools as _functools

# name → constructor, mirroring the reference's 11-embedder registry
# (reference: cath/embed.py:34-46) + the AA-composition baseline
# (reference: cath/embed_all.py:23-44). ProtT5 variants share one
# architecture (different checkpoints); ESM/BERT variants share another.
EMBEDDERS = {
    "ProtT5 XL U50": ProtT5Embedder,
    "ProtT5-BFD": ProtT5Embedder,
    "ProtT5 UniRef50": ProtT5Embedder,
    "SeqVec": SeqVecEmbedder,
    "ESM": _functools.partial(BertEmbedder, arch="ESM"),
    "ESM1b": _functools.partial(BertEmbedder, arch="ESM1b"),
    "ProtBert BFD": _functools.partial(BertEmbedder, arch="ProtBert BFD"),
    "ProtAlbert BFD": _functools.partial(BertEmbedder, arch="ProtAlbert BFD"),
    "UniRep": UniRepEmbedder,
    "ProtXLNet UniRef100": XLNetEmbedder,
    "CPCProt": CPCProtEmbedder,
    "PLUS": PlusRnnEmbedder,
    "AA Composition": AACompositionEmbedder,
}


def get_embedder(name: str, **kwargs) -> EmbedderBase:
    if name not in EMBEDDERS:
        raise KeyError(
            f"unknown embedder {name!r}; available: {sorted(EMBEDDERS)}"
        )
    return EMBEDDERS[name](**kwargs)
