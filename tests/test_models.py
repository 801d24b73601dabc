import numpy as np
import pytest

import jax.numpy as jnp

from knn_for_homology_tpu.models import (
    AACompositionEmbedder,
    ProtT5Embedder,
    SeqVecEmbedder,
    elmo,
    get_embedder,
    make_batches,
    mean_pool,
    pool_domain_range,
    t5,
)

SEQS = [
    "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ",
    "ACDEFGHIKLMNPQRSTVWY",
    "MSH",
    "MKKLVLSLSLVLAFSSATAAF",
]


@pytest.fixture(scope="module")
def tiny_t5():
    params = t5.init_params(t5.TINY, seed=0)
    return ProtT5Embedder(params=params, config=t5.TINY, token_budget=512)


@pytest.fixture(scope="module")
def tiny_seqvec():
    params = elmo.init_params(elmo.TINY_ELMO, seed=0)
    return SeqVecEmbedder(params=params, config=elmo.TINY_ELMO)


def test_t5_padding_invariance(tiny_t5):
    """A sequence must embed identically regardless of batch padding —
    the masked encoder is the whole point of static-shape batching."""
    single = list(tiny_t5.embed_per_residue([SEQS[2]]))[0]
    batched = list(tiny_t5.embed_per_residue(SEQS))[2]
    assert single.shape == (len(SEQS[2]), t5.TINY.d_model)
    np.testing.assert_allclose(single, batched, atol=2e-2, rtol=2e-2)


def test_t5_embed_order_and_shapes(tiny_t5):
    embs = list(tiny_t5.embed_per_residue(SEQS))
    for seq, emb in zip(SEQS, embs):
        assert emb.shape == (len(seq), t5.TINY.d_model)
    # pooled = mean of per-residue
    pooled = tiny_t5.embed_pooled(SEQS)
    for row, emb in enumerate(embs):
        np.testing.assert_allclose(
            pooled[row], emb.mean(axis=0), atol=2e-2, rtol=2e-2
        )


def test_t5_tokenizer_rare_residues():
    toks = t5.tokenize("AUZOBX")
    # U/Z/O/B → X; EOS appended
    x_id = t5.PROTT5_VOCAB["X"]
    assert toks.tolist() == [3, x_id, x_id, x_id, x_id, x_id, t5.EOS_ID]


def test_bert_xlnet_tokenizers_rare_residues():
    """All ProtTrans-family tokenizers map U/Z/O/B → X (bio_embeddings
    preprocessing); ESM keeps them — its alphabet covers them natively."""
    from knn_for_homology_tpu.models import bert, xlnet

    b = bert.tokenize_bert("UZOB")
    assert b.tolist() == [bert.BERT_CLS] + [bert.BERT_VOCAB["X"]] * 4 + [
        bert.BERT_SEP
    ]
    x = xlnet.tokenize("UZOB")
    assert x.tolist() == [xlnet.XLNET_VOCAB["X"]] * 4 + [
        xlnet.XLNET_SEP,
        xlnet.XLNET_CLS,
    ]
    e = bert.tokenize_esm("UZOB")
    assert e.tolist() == [
        bert.ESM_CLS,
        bert.ESM_VOCAB["U"],
        bert.ESM_VOCAB["Z"],
        bert.ESM_VOCAB["O"],
        bert.ESM_VOCAB["B"],
        bert.ESM_EOS,
    ]


def test_seqvec_shapes_and_variants(tiny_seqvec):
    embs = list(tiny_seqvec.embed_per_residue(SEQS[:2]))
    d = 2 * elmo.TINY_ELMO.proj_dim
    for seq, emb in zip(SEQS[:2], embs):
        assert emb.shape == (3, len(seq), d)
        # layer0 is the duplicated char repr: halves identical
        np.testing.assert_array_equal(emb[0, :, : d // 2], emb[0, :, d // 2 :])
    variants = tiny_seqvec.embed_layer_variants(SEQS[:2])
    assert set(variants) == {
        "SeqVec Sum",
        "SeqVec CharCNN",
        "SeqVec LSTM1",
        "SeqVec LSTM2",
    }
    np.testing.assert_allclose(
        variants["SeqVec Sum"],
        variants["SeqVec CharCNN"]
        + variants["SeqVec LSTM1"]
        + variants["SeqVec LSTM2"],
        rtol=1e-5,
        atol=1e-6,
    )


def test_seqvec_padding_invariance(tiny_seqvec):
    single = list(tiny_seqvec.embed_per_residue([SEQS[2]]))[0]
    batched = list(tiny_seqvec.embed_per_residue(SEQS))[2]
    np.testing.assert_allclose(single, batched, atol=1e-5, rtol=1e-5)


def test_seqvec_bidirectional_not_symmetric(tiny_seqvec):
    """Reversing the sequence must change LSTM layers (direction matters)."""
    fwd = list(tiny_seqvec.embed_per_residue([SEQS[0]]))[0]
    rev = list(tiny_seqvec.embed_per_residue([SEQS[0][::-1]]))[0]
    assert not np.allclose(fwd[1], rev[1][::-1])


def test_batching_budget_and_order():
    batches = make_batches(SEQS, token_budget=64, max_len=30, bucket=8)
    seen = sorted(i for b in batches for i in b.indices)
    assert seen == [0, 1, 2, 3]
    for b in batches:
        assert len(b.indices) * b.padded_len <= 64 or len(b.indices) == 1
        for s in b.sequences:
            assert len(s) <= 30  # truncation applied


def test_mean_pool_masks_padding():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
    mask = jnp.asarray([[True, True, True, False, False, False]])
    out = np.asarray(mean_pool(x, mask))
    np.testing.assert_allclose(out[0], np.arange(24).reshape(6, 4)[:3].mean(0))


def test_pool_domain_range_one_based_inclusive():
    emb = np.arange(50, dtype=np.float32).reshape(10, 5)
    # reference semantics: embedding[start-1:stop]
    np.testing.assert_allclose(
        pool_domain_range(emb, 2, 4), emb[1:4].mean(axis=0)
    )


def test_aa_composition_baseline():
    embedder = get_embedder("AA Composition", alphabet="AB")
    out = embedder.embed_pooled(["AAB", "BBB"])
    np.testing.assert_allclose(out[0], [2 / 3, 1 / 3])
    np.testing.assert_allclose(out[1], [0.0, 1.0])


def test_aa_composition_stable_across_calls():
    """Train and test embedded separately must share one vector space."""
    embedder = get_embedder("AA Composition")
    a = embedder.embed_pooled(["ACD"])   # no W anywhere
    b = embedder.embed_pooled(["WWW"])   # only W
    assert a.shape[1] == b.shape[1]
    alphabet = embedder.alphabet
    assert b[0, alphabet.index("W")] == 1.0
    assert a[0, alphabet.index("A")] > 0


def test_registry_errors():
    with pytest.raises(KeyError):
        get_embedder("NoSuchModel")
    with pytest.raises(ValueError, match="checkpoint"):
        ProtT5Embedder()


def test_bert_embedder_shapes_and_padding_invariance():
    from knn_for_homology_tpu.models import bert
    from knn_for_homology_tpu.models.registry import BertEmbedder

    params = bert.init_params(bert.TINY_BERT, seed=0)
    emb = BertEmbedder(
        arch="ESM1b", params=params, config=bert.TINY_BERT, token_budget=512
    )
    embs = list(emb.embed_per_residue(SEQS))
    for seq, e in zip(SEQS, embs):
        assert e.shape == (len(seq), bert.TINY_BERT.d_model)
    single = list(emb.embed_per_residue([SEQS[2]]))[0]
    np.testing.assert_allclose(single, embs[2], atol=1e-4, rtol=1e-4)


def test_bert_truncation_at_max_positions():
    from knn_for_homology_tpu.models import bert
    from knn_for_homology_tpu.models.registry import BertEmbedder

    params = bert.init_params(bert.TINY_BERT, seed=0)
    emb = BertEmbedder(arch="ESM1b", params=params, config=bert.TINY_BERT)
    long_seq = "A" * 200  # > max_positions-2 = 62
    out = list(emb.embed_per_residue([long_seq]))[0]
    assert out.shape[0] == bert.TINY_BERT.max_positions - 2


def test_albert_layer_sharing():
    from knn_for_homology_tpu.models import bert

    cfg = bert.BertConfig(
        vocab_size=32, d_model=32, d_ff=64, num_layers=4, num_heads=4,
        max_positions=64, pre_norm=False, share_layers=True,
    )
    params = bert.init_params(cfg, seed=1)
    assert len(params["layers"]) == 1  # shared
    import jax.numpy as jnp

    ids = np.random.RandomState(0).randint(4, 20, (2, 10)).astype(np.int32)
    out = bert.encode(
        params, jnp.asarray(ids), jnp.ones((2, 10), bool), cfg
    )
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_unirep_mlstm():
    from knn_for_homology_tpu.models import unirep
    from knn_for_homology_tpu.models.registry import UniRepEmbedder

    params = unirep.init_params(unirep.TINY_UNIREP, seed=0)
    emb = UniRepEmbedder(params=params, config=unirep.TINY_UNIREP)
    embs = list(emb.embed_per_residue(SEQS[:2]))
    for seq, e in zip(SEQS[:2], embs):
        assert e.shape == (len(seq), unirep.TINY_UNIREP.hidden_dim)
    # order matters in a recurrent model
    fwd = list(emb.embed_per_residue([SEQS[0]]))[0]
    rev = list(emb.embed_per_residue([SEQS[0][::-1]]))[0]
    assert not np.allclose(fwd, rev[::-1])


def test_xlnet_embedder_shapes_and_padding_invariance():
    from knn_for_homology_tpu.models import xlnet
    from knn_for_homology_tpu.models.registry import XLNetEmbedder

    params = xlnet.init_params(xlnet.TINY_XLNET, seed=0)
    emb = XLNetEmbedder(
        params=params, config=xlnet.TINY_XLNET, token_budget=512
    )
    embs = list(emb.embed_per_residue(SEQS))
    for seq, e in zip(SEQS, embs):
        assert e.shape == (len(seq), xlnet.TINY_XLNET.d_model)
    single = list(emb.embed_per_residue([SEQS[2]]))[0]
    np.testing.assert_allclose(single, embs[2], atol=1e-4, rtol=1e-4)
    # recurrence-free but position-aware: with the position projection
    # amplified (tiny random init makes bd ~1e-5), reversal must not commute
    import jax.numpy as jnp

    boosted = {
        "embedding": params["embedding"],
        "layers": [
            {k: (v * 50.0 if k == "r" else v) for k, v in layer.items()}
            for layer in params["layers"]
        ],
    }
    emb_pos = XLNetEmbedder(params=boosted, config=xlnet.TINY_XLNET)
    fwd = list(emb_pos.embed_per_residue([SEQS[0]]))[0]
    rev = list(emb_pos.embed_per_residue([SEQS[0][::-1]]))[0]
    assert not np.allclose(fwd, rev[::-1], atol=1e-3)


def test_plus_rnn_embedder_shapes_and_padding_invariance():
    from knn_for_homology_tpu.models import plus_rnn
    from knn_for_homology_tpu.models.registry import PlusRnnEmbedder

    params = plus_rnn.init_params(plus_rnn.TINY_PLUS, seed=0)
    emb = PlusRnnEmbedder(params=params, config=plus_rnn.TINY_PLUS)
    embs = list(emb.embed_per_residue(SEQS))
    for seq, e in zip(SEQS, embs):
        assert e.shape == (len(seq), 2 * plus_rnn.TINY_PLUS.hidden_dim)
    single = list(emb.embed_per_residue([SEQS[2]]))[0]
    np.testing.assert_allclose(single, embs[2], atol=1e-4, rtol=1e-4)
    # bidirectional recurrence: direction must matter
    fwd = list(emb.embed_per_residue([SEQS[0]]))[0]
    rev = list(emb.embed_per_residue([SEQS[0][::-1]]))[0]
    assert not np.allclose(fwd, rev[::-1])


def test_cpcprot_embedder_patching():
    from knn_for_homology_tpu.models import cpcprot
    from knn_for_homology_tpu.models.registry import CPCProtEmbedder

    cfg = cpcprot.TINY_CPCPROT  # patch_len=4
    params = cpcprot.init_params(cfg, seed=0)
    emb = CPCProtEmbedder(params=params, config=cfg)
    seqs = ["MKVLAWWGD", "GDT", "MKVLAWWG" * 4]  # 2, 1 (padded), 8 patches
    embs = list(emb.embed_per_residue(seqs))
    assert [e.shape for e in embs] == [(2, 16), (1, 16), (8, 16)]
    # batching must not change values (single vs grouped)
    single = list(emb.embed_per_residue([seqs[2]]))[0]
    np.testing.assert_allclose(single, embs[2], atol=1e-4, rtol=1e-4)
    pooled = emb.embed_pooled(seqs)  # z_mean
    assert pooled.shape == (3, 16)
    np.testing.assert_allclose(pooled[1], embs[1].mean(0), atol=1e-5)


def test_registry_full_inventory_and_gating():
    from knn_for_homology_tpu.models.registry import EMBEDDERS

    # the reference's 11 embedders + AA composition are all addressable
    for name in [
        "ProtT5 XL U50", "ProtT5-BFD", "ProtT5 UniRef50", "SeqVec", "ESM",
        "ESM1b", "ProtBert BFD", "ProtAlbert BFD", "UniRep",
        "ProtXLNet UniRef100", "CPCProt", "PLUS", "AA Composition",
    ]:
        assert name in EMBEDDERS
    # every neural entry is architecture-complete: construction without a
    # checkpoint fails with the install hint, never NotImplementedError
    for name in EMBEDDERS:
        if name == "AA Composition":
            continue
        with pytest.raises(ValueError, match="checkpoint"):
            get_embedder(name)


def test_convert_bert_from_synthetic_hf_dir(tmp_path):
    """Validate the HF→pytree mapping against a synthetic HF BertModel
    checkpoint (correct key names + shapes), then run the encoder."""
    import json as _json

    import torch

    from knn_for_homology_tpu.models.convert import convert_bert_from_hf

    hf_cfg = dict(
        vocab_size=12, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=24, layer_norm_eps=1e-12,
    )
    (tmp_path / "config.json").write_text(_json.dumps(hf_cfg))
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    d, f = 16, 32
    sd = {
        "embeddings.word_embeddings.weight": t(12, d),
        "embeddings.position_embeddings.weight": t(24, d),
        "embeddings.LayerNorm.weight": torch.ones(d),
        "embeddings.LayerNorm.bias": torch.zeros(d),
    }
    for i in range(2):
        base = f"encoder.layer.{i}"
        sd.update(
            {
                f"{base}.attention.self.query.weight": t(d, d),
                f"{base}.attention.self.query.bias": torch.zeros(d),
                f"{base}.attention.self.key.weight": t(d, d),
                f"{base}.attention.self.key.bias": torch.zeros(d),
                f"{base}.attention.self.value.weight": t(d, d),
                f"{base}.attention.self.value.bias": torch.zeros(d),
                f"{base}.attention.output.dense.weight": t(d, d),
                f"{base}.attention.output.dense.bias": torch.zeros(d),
                f"{base}.attention.output.LayerNorm.weight": torch.ones(d),
                f"{base}.attention.output.LayerNorm.bias": torch.zeros(d),
                f"{base}.intermediate.dense.weight": t(f, d),
                f"{base}.intermediate.dense.bias": torch.zeros(f),
                f"{base}.output.dense.weight": t(d, f),
                f"{base}.output.dense.bias": torch.zeros(d),
                f"{base}.output.LayerNorm.weight": torch.ones(d),
                f"{base}.output.LayerNorm.bias": torch.zeros(d),
            }
        )
    torch.save(sd, tmp_path / "pytorch_model.bin")

    config, params = convert_bert_from_hf(tmp_path)
    assert config.d_model == 16 and config.num_layers == 2
    from knn_for_homology_tpu.models import bert

    ids = np.random.RandomState(0).randint(4, 11, (2, 9)).astype(np.int32)
    out = bert.encode(
        params, jnp.asarray(ids), jnp.ones((2, 9), bool), config
    )
    assert out.shape == (2, 9, 16)
    assert np.isfinite(np.asarray(out)).all()
    # weight orientation check: our [in, out] == HF [out, in].T
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["wi"]),
        sd["encoder.layer.0.intermediate.dense.weight"].numpy().T,
        rtol=1e-6,
    )


def test_convert_t5_from_synthetic_hf_dir(tmp_path):
    import json as _json

    import torch

    from knn_for_homology_tpu.models.convert import convert_t5_from_hf

    hf_cfg = dict(
        vocab_size=10, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
    )
    (tmp_path / "config.json").write_text(_json.dumps(hf_cfg))
    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    d, inner, f = 16, 16, 32
    sd = {"shared.weight": t(10, d),
          "encoder.final_layer_norm.weight": torch.ones(d),
          "encoder.block.0.layer.0.SelfAttention"
          ".relative_attention_bias.weight": t(8, 4)}
    for i in range(2):
        base = f"encoder.block.{i}"
        sd.update({
            f"{base}.layer.0.SelfAttention.q.weight": t(inner, d),
            f"{base}.layer.0.SelfAttention.k.weight": t(inner, d),
            f"{base}.layer.0.SelfAttention.v.weight": t(inner, d),
            f"{base}.layer.0.SelfAttention.o.weight": t(d, inner),
            f"{base}.layer.0.layer_norm.weight": torch.ones(d),
            f"{base}.layer.1.DenseReluDense.wi.weight": t(f, d),
            f"{base}.layer.1.DenseReluDense.wo.weight": t(d, f),
            f"{base}.layer.1.layer_norm.weight": torch.ones(d),
        })
    torch.save(sd, tmp_path / "pytorch_model.bin")

    import jax.numpy as jnp2

    config, params = convert_t5_from_hf(tmp_path, dtype=jnp2.float32)
    assert config.d_model == 16 and config.rel_buckets == 8
    ids = np.random.RandomState(0).randint(3, 9, (2, 7)).astype(np.int32)
    out = t5.encode(params, jnp.asarray(ids), jnp.ones((2, 7), bool), config)
    assert out.shape == (2, 7, 16)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(params["layers"][1]["mlp"]["wi"]),
        sd["encoder.block.1.layer.1.DenseReluDense.wi.weight"].numpy().T,
        rtol=1e-6,
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    from knn_for_homology_tpu.models.convert import (
        load_params_orbax,
        save_params_orbax,
    )

    params = t5.init_params(t5.TINY, seed=0)
    save_params_orbax(params, tmp_path / "ckpt")
    restored = load_params_orbax(tmp_path / "ckpt", like=params)
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_t5_checkpoint_custom_vocab_roundtrip(tmp_path):
    """A checkpoint carrying its own tokenizer table must be used for
    tokenisation (differing sentencepiece orderings would otherwise map
    residues to wrong embedding rows silently)."""
    from knn_for_homology_tpu.models.convert import load_t5_checkpoint, save_params

    cfg = t5.TINY
    custom_vocab = {aa: 3 + i for i, aa in enumerate("WYVTSRQPNMLKIHGFEDCA")}
    custom_vocab["X"] = 23
    save_params(
        t5.init_params(cfg, 0),
        tmp_path / "ck.npz",
        meta={
            "config": {
                "vocab_size": cfg.vocab_size, "d_model": cfg.d_model,
                "d_kv": cfg.d_kv, "d_ff": cfg.d_ff,
                "num_layers": cfg.num_layers, "num_heads": cfg.num_heads,
            },
            "vocab": custom_vocab,
        },
    )
    config, params, vocab = load_t5_checkpoint(tmp_path / "ck.npz")
    assert vocab == custom_vocab
    emb = ProtT5Embedder(checkpoint=tmp_path / "ck.npz")
    assert emb.vocab == custom_vocab
    # tokenisation actually uses it: 'W' maps to 3 under the custom table
    assert t5.tokenize("W", emb.vocab)[0] == 3


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _unirep_tf_oracle(tensors, token_ids):
    """Independent numpy mLSTM with bilm-style RUNTIME weight normalisation,
    exactly as the churchlab TF graph / jax-unirep evaluate it (the
    conversion instead fuses the gains into the weights up front)."""

    def wn(w, g):
        return w / np.linalg.norm(w, axis=0, keepdims=True) * g

    wx = wn(tensors["rnn_mlstm_mlstm_wx:0"], tensors["rnn_mlstm_mlstm_gx:0"])
    wh = wn(tensors["rnn_mlstm_mlstm_wh:0"], tensors["rnn_mlstm_mlstm_gh:0"])
    wmx = wn(tensors["rnn_mlstm_mlstm_wmx:0"], tensors["rnn_mlstm_mlstm_gmx:0"])
    wmh = wn(tensors["rnn_mlstm_mlstm_wmh:0"], tensors["rnn_mlstm_mlstm_gmh:0"])
    b = tensors["rnn_mlstm_mlstm_b:0"]
    emb = tensors["embed_matrix:0"]
    hidden = wmh.shape[1]
    h = np.zeros(hidden, dtype=np.float64)
    c = np.zeros(hidden, dtype=np.float64)
    out = []
    for t in token_ids:
        x = emb[t].astype(np.float64)
        m = (x @ wmx) * (h @ wmh)
        z = x @ wx + m @ wh + b
        i, f, o, u = np.split(z, 4)
        c = _sigmoid(f) * c + _sigmoid(i) * np.tanh(u)
        h = _sigmoid(o) * np.tanh(c)
        out.append(h.copy())
    return np.asarray(out)


def test_unirep_conversion_matches_tf_oracle(tmp_path):
    """convert_unirep_from_npy (gain fusion, gate order, layout) against an
    independent numpy oracle that applies weight norm at runtime the way the
    churchlab TF graph does (VERDICT r1 #4)."""
    from knn_for_homology_tpu.models import unirep
    from knn_for_homology_tpu.models.convert import convert_unirep_from_npy

    rng = np.random.RandomState(7)
    e, h = 6, 12
    tensors = {
        "embed_matrix:0": rng.randn(26, e).astype(np.float32),
        "rnn_mlstm_mlstm_wx:0": rng.randn(e, 4 * h).astype(np.float32),
        "rnn_mlstm_mlstm_wh:0": rng.randn(h, 4 * h).astype(np.float32),
        "rnn_mlstm_mlstm_wmx:0": rng.randn(e, h).astype(np.float32),
        "rnn_mlstm_mlstm_wmh:0": rng.randn(h, h).astype(np.float32),
        "rnn_mlstm_mlstm_b:0": rng.randn(4 * h).astype(np.float32),
        "rnn_mlstm_mlstm_gx:0": rng.rand(4 * h).astype(np.float32) + 0.5,
        "rnn_mlstm_mlstm_gh:0": rng.rand(4 * h).astype(np.float32) + 0.5,
        "rnn_mlstm_mlstm_gmx:0": rng.rand(h).astype(np.float32) + 0.5,
        "rnn_mlstm_mlstm_gmh:0": rng.rand(h).astype(np.float32) + 0.5,
    }
    ckpt = tmp_path / "1900_weights"
    ckpt.mkdir()
    for name, arr in tensors.items():
        np.save(ckpt / f"{name}.npy", arr)

    config, params = convert_unirep_from_npy(ckpt)
    assert config.hidden_dim == h and config.embed_dim == e

    seq = "MKVLITGAGQRST"
    ids = unirep.tokenize(seq)[None, :]  # [1, L] incl. start token
    mask = np.ones_like(ids, dtype=bool)
    ours = np.asarray(
        unirep.encode(params, jnp.asarray(ids), jnp.asarray(mask), config)
    )[0]
    want = _unirep_tf_oracle(tensors, ids[0])
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=2e-5)


def test_unirep_embedder_accepts_npy_dir(tmp_path):
    """UniRepEmbedder(checkpoint=<churchlab dir>) converts in place; the
    per-residue output drops the start-token step."""
    from knn_for_homology_tpu.models.registry import UniRepEmbedder

    rng = np.random.RandomState(3)
    e, h = 4, 8
    ckpt = tmp_path / "w"
    ckpt.mkdir()
    np.save(ckpt / "embed_matrix:0.npy", rng.randn(26, e).astype(np.float32))
    for name, shape in [
        ("wx", (e, 4 * h)), ("wh", (h, 4 * h)),
        ("wmx", (e, h)), ("wmh", (h, h)),
    ]:
        np.save(
            ckpt / f"rnn_mlstm_mlstm_{name}:0.npy",
            rng.randn(*shape).astype(np.float32),
        )
    np.save(
        ckpt / "rnn_mlstm_mlstm_b:0.npy", rng.randn(4 * h).astype(np.float32)
    )  # no gain tensors: pre-fused dump loads verbatim
    emb = UniRepEmbedder(checkpoint=ckpt)
    assert emb.dim == h
    out = list(emb.embed_per_residue(["MKVL"]))[0]
    assert out.shape == (4, h)
    assert np.isfinite(out).all()
