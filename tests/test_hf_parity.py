"""Numeric parity of converted checkpoints against the upstream torch
implementations (randomly-initialised tiny configs — no downloads).

The reference consumes these models through bio_embeddings/HF
(reference: cath/embed.py:12-46); here every conversion mapping is checked
end-to-end: random HF/torch model → save state dict → convert → our encoder
must reproduce last_hidden_state within float32 tolerance.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

ATOL = 2e-4


def _dump(model, cfg, tmp_path):
    (tmp_path / "config.json").write_text(json.dumps(cfg.to_dict()))
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")


def test_bert_matches_hf_bertmodel(tmp_path):
    from knn_for_homology_tpu.models import bert
    from knn_for_homology_tpu.models.convert import convert_bert_from_hf

    cfg = transformers.BertConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg).eval()
    _dump(model, cfg, tmp_path)

    config, params = convert_bert_from_hf(tmp_path)
    ids = np.random.RandomState(1).randint(5, 29, (2, 11)).astype(np.int32)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.ones(2, 11, dtype=torch.long),
        ).last_hidden_state.numpy()
    got = np.asarray(
        bert.encode(params, jnp.asarray(ids), jnp.ones((2, 11), bool), config)
    )
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_albert_matches_hf_albertmodel(tmp_path):
    from knn_for_homology_tpu.models import bert
    from knn_for_homology_tpu.models.convert import convert_albert_from_hf

    cfg = transformers.AlbertConfig(
        vocab_size=30, embedding_size=16, hidden_size=32,
        num_hidden_layers=3, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.AlbertModel(cfg).eval()
    _dump(model, cfg, tmp_path)

    config, params = convert_albert_from_hf(tmp_path)
    assert config.share_layers and config.embed_dim == 16
    assert len(params["layers"]) == 1
    ids = np.random.RandomState(2).randint(5, 29, (2, 13)).astype(np.int32)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.ones(2, 13, dtype=torch.long),
        ).last_hidden_state.numpy()
    got = np.asarray(
        bert.encode(params, jnp.asarray(ids), jnp.ones((2, 13), bool), config)
    )
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_t5_matches_hf_t5encodermodel(tmp_path):
    """Flagship conversion: our T5 encoder (RMSNorm, shared relative bias,
    unscaled QK^T, ReLU FF) must reproduce HF T5EncoderModel."""
    import jax.numpy as jnp_

    from knn_for_homology_tpu.models import t5
    from knn_for_homology_tpu.models.convert import convert_t5_from_hf

    cfg = transformers.T5Config(
        vocab_size=32, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="relu", is_encoder_decoder=False,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(cfg).eval()
    _dump(model, cfg, tmp_path)

    config, params = convert_t5_from_hf(tmp_path, dtype=jnp_.float32)
    ids = np.random.RandomState(7).randint(3, 31, (2, 14)).astype(np.int32)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.ones(2, 14, dtype=torch.long),
        ).last_hidden_state.numpy()
    got = np.asarray(
        t5.encode(params, jnp.asarray(ids), jnp.ones((2, 14), bool), config)
    )
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_xlnet_matches_hf_xlnetmodel(tmp_path):
    from knn_for_homology_tpu.models import xlnet
    from knn_for_homology_tpu.models.convert import convert_xlnet_from_hf

    cfg = transformers.XLNetConfig(
        vocab_size=30, d_model=32, n_layer=3, n_head=4, d_inner=64,
        dropout=0.0, bi_data=False, attn_type="bi", untie_r=True,
    )
    torch.manual_seed(0)
    model = transformers.XLNetModel(cfg).eval()
    _dump(model, cfg, tmp_path)

    config, params = convert_xlnet_from_hf(tmp_path)
    ids = np.random.RandomState(3).randint(5, 29, (2, 12)).astype(np.int32)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.ones(2, 12, dtype=torch.long),
        ).last_hidden_state.numpy()
    got = np.asarray(
        xlnet.encode(params, jnp.asarray(ids), jnp.ones((2, 12), bool),
                     config)
    )
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_xlnet_matches_hf_with_padding(tmp_path):
    """Padded batch: valid positions must match HF's masked forward."""
    from knn_for_homology_tpu.models import xlnet
    from knn_for_homology_tpu.models.convert import convert_xlnet_from_hf

    cfg = transformers.XLNetConfig(
        vocab_size=30, d_model=32, n_layer=2, n_head=4, d_inner=64,
        dropout=0.0, bi_data=False, attn_type="bi",
    )
    torch.manual_seed(1)
    model = transformers.XLNetModel(cfg).eval()
    _dump(model, cfg, tmp_path)
    config, params = convert_xlnet_from_hf(tmp_path)

    ids = np.random.RandomState(4).randint(5, 29, (2, 10)).astype(np.int32)
    tmask = np.ones((2, 10), dtype=np.int64)
    tmask[0, 7:] = 0  # row 0 padded after 7 tokens
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(tmask),
        ).last_hidden_state.numpy()
    got = np.asarray(
        xlnet.encode(
            params, jnp.asarray(ids), jnp.asarray(tmask.astype(bool)), config
        )
    )
    np.testing.assert_allclose(got[0, :7], want[0, :7], atol=ATOL)
    np.testing.assert_allclose(got[1], want[1], atol=ATOL)


@pytest.mark.parametrize("token_dropout", [False, True])
def test_esm_matches_hf_esmmodel(tmp_path, token_dropout):
    """ESM-1b-style conversion (pre-LN, learned positions offset 2, exact
    GELU): matches HF EsmModel, driven through the registry embedder with
    an HF checkpoint directory. The real facebook/esm1b checkpoint has
    token_dropout=True — HF then scales word embeddings by (1-0.15*0.8)
    when no <mask> is present, which conversion folds into the table."""
    from knn_for_homology_tpu.models import bert
    from knn_for_homology_tpu.models.convert import convert_esm_from_hf
    from knn_for_homology_tpu.models.registry import BertEmbedder

    cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, position_embedding_type="absolute",
        emb_layer_norm_before=True, token_dropout=token_dropout,
        pad_token_id=1,
        mask_token_id=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    _dump(model, cfg, tmp_path)

    config, params = convert_esm_from_hf(tmp_path)
    assert config.pre_norm and config.position_offset == 2
    ids = np.random.RandomState(8).randint(4, 29, (2, 10)).astype(np.int32)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.ones(2, 10, dtype=torch.long),
        ).last_hidden_state.numpy()
    got = np.asarray(
        bert.encode(params, jnp.asarray(ids), jnp.ones((2, 10), bool), config)
    )
    np.testing.assert_allclose(got, want, atol=ATOL)

    # same checkpoint through the registry (HF dir converts in place)
    emb = BertEmbedder(arch="ESM1b", checkpoint=tmp_path)
    outs = list(emb.embed_per_residue(["MKVLA"]))
    assert outs[0].shape == (5, 32)

    # probe: an ESM-2 (rotary) config must refuse, not mis-convert
    cfg2 = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        position_embedding_type="rotary",
    )
    d2 = tmp_path / "esm2"
    d2.mkdir()
    _dump(transformers.EsmModel(cfg2, add_pooling_layer=False), cfg2, d2)
    with pytest.raises(ValueError, match="rotary"):
        convert_esm_from_hf(d2)


def test_plus_rnn_matches_torch_packed_bilstm(tmp_path):
    """Converted biLSTM reproduces torch nn.LSTM with pack_padded_sequence
    (the correct padded-batch semantics) at every valid position."""
    from knn_for_homology_tpu.models import plus_rnn
    from knn_for_homology_tpu.models.convert import convert_plus_rnn_from_torch

    torch.manual_seed(0)
    embed = torch.nn.Embedding(21, 8)
    rnn = torch.nn.LSTM(
        input_size=8, hidden_size=12, num_layers=2, bidirectional=True,
        batch_first=True,
    ).eval()
    sd = {"embed.weight": embed.weight.detach()}
    sd.update({f"rnn.{k}": v for k, v in rnn.state_dict().items()})
    torch.save(sd, tmp_path / "plus_rnn.pt")

    config, params = convert_plus_rnn_from_torch(tmp_path / "plus_rnn.pt")
    assert config.hidden_dim == 12 and config.num_layers == 2

    ids = np.random.RandomState(5).randint(0, 21, (3, 9)).astype(np.int32)
    lengths = np.array([9, 6, 3])
    mask = np.arange(9)[None, :] < lengths[:, None]
    with torch.no_grad():
        x = embed(torch.tensor(ids, dtype=torch.long))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, torch.tensor(lengths), batch_first=True,
            enforce_sorted=False,
        )
        out, _ = rnn(packed)
        want, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True
        )
        want = want.numpy()
    got = np.asarray(
        plus_rnn.encode(params, jnp.asarray(ids), jnp.asarray(mask), config)
    )
    for row, n in enumerate(lengths):
        np.testing.assert_allclose(got[row, :n], want[row, :n], atol=ATOL)


def test_read_hf_tokenizer_vocab_and_embedder_override(tmp_path):
    """Converted HF dirs pick up the checkpoint's own residue→id table
    (vocab.txt / tokenizer.json), not the hard-coded default order."""
    import json as _json

    from knn_for_homology_tpu.models.convert import read_hf_tokenizer_vocab
    from knn_for_homology_tpu.models.registry import BertEmbedder

    # WordPiece vocab.txt with a DIFFERENT residue order than the default
    d1 = tmp_path / "wp"
    d1.mkdir()
    (d1 / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                  + list("ACDEFGHIKLMNPQRSTVWY"))
    )
    table = read_hf_tokenizer_vocab(d1)
    assert table["A"] == 5 and table["Y"] == 24 and "[PAD]" not in table

    # tokenizer.json (unigram list) with sentencepiece ▁ markers
    d2 = tmp_path / "sp"
    d2.mkdir()
    (d2 / "tokenizer.json").write_text(_json.dumps({
        "model": {"vocab": [["<pad>", 0.0], ["▁L", -1.0], ["▁A", -2.0],
                            ["G", -3.0]]}
    }))
    table2 = read_hf_tokenizer_vocab(d2)
    assert table2 == {"L": 1, "A": 2, "G": 3}

    # no tokenizer files → None (caller keeps the documented default)
    d3 = tmp_path / "none"
    d3.mkdir()
    assert read_hf_tokenizer_vocab(d3) is None

    # end-to-end: an ESM HF dir with vocab.txt changes the tokens used
    cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, position_embedding_type="absolute",
        emb_layer_norm_before=True, token_dropout=False, pad_token_id=1,
        mask_token_id=32,
    )
    torch.manual_seed(2)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    _dump(model, cfg, d1)
    emb = BertEmbedder(arch="ESM1b", checkpoint=d1)
    assert emb.vocab is not None and emb.vocab["A"] == 5
    out_with = list(emb.embed_per_residue(["MKVLA"]))[0]
    emb.vocab = None  # default table gives different ids → different output
    out_without = list(emb.embed_per_residue(["MKVLA"]))[0]
    assert not np.allclose(out_with, out_without)


def test_cpcprot_conv_order_natural_sort(tmp_path):
    """Ten+ conv layers must load in numeric order (conv10 after conv9)."""
    from knn_for_homology_tpu.models.convert import convert_cpcprot_from_torch

    torch.manual_seed(3)
    sd = {"encoder.embedding.weight": torch.randn(30, 4)}
    in_ch = 4
    for i in range(11):
        out_ch = 4 + i  # strictly increasing → order is observable
        sd[f"encoder.conv{i}.weight"] = torch.randn(out_ch, in_ch, 3)
        sd[f"encoder.conv{i}.bias"] = torch.zeros(out_ch)
        in_ch = out_ch
    gru = torch.nn.GRU(input_size=14, hidden_size=6, batch_first=True)
    sd.update({f"autoregressor.{k}": v for k, v in gru.state_dict().items()})
    torch.save(sd, tmp_path / "deep.pt")
    config, params = convert_cpcprot_from_torch(tmp_path / "deep.pt")
    assert config.conv_spec == tuple((4 + i, 3) for i in range(11))
    assert [p["w"].shape[2] for p in params["convs"]] == [
        4 + i for i in range(11)
    ]


def test_cpcprot_matches_torch_conv_gru(tmp_path):
    """Converted conv+GRU encoder reproduces an equivalent torch module
    (Embedding → Conv1d/ReLU stack → mean pool → GRU) per patch."""
    from knn_for_homology_tpu.models import cpcprot
    from knn_for_homology_tpu.models.convert import convert_cpcprot_from_torch

    torch.manual_seed(0)
    embed = torch.nn.Embedding(30, 8)
    conv0 = torch.nn.Conv1d(8, 16, 3, padding=1)
    conv1 = torch.nn.Conv1d(16, 24, 3, padding=1)
    gru = torch.nn.GRU(input_size=24, hidden_size=12, batch_first=True).eval()
    sd = {
        "encoder.embedding.weight": embed.weight.detach(),
        "encoder.conv0.weight": conv0.weight.detach(),
        "encoder.conv0.bias": conv0.bias.detach(),
        "encoder.conv1.weight": conv1.weight.detach(),
        "encoder.conv1.bias": conv1.bias.detach(),
    }
    sd.update({f"autoregressor.{k}": v for k, v in gru.state_dict().items()})
    torch.save(sd, tmp_path / "cpcprot.pt")

    config, params = convert_cpcprot_from_torch(
        tmp_path / "cpcprot.pt", patch_len=4
    )
    assert config.conv_spec == ((16, 3), (24, 3))
    assert config.z_dim == 24 and config.c_dim == 12

    ids = np.random.RandomState(6).randint(5, 29, (2, 3, 4)).astype(np.int32)
    with torch.no_grad():
        x = embed(torch.tensor(ids.reshape(6, 4), dtype=torch.long))
        x = x.transpose(1, 2)  # torch conv: [N, C, L]
        x = torch.relu(conv0(x))
        x = torch.relu(conv1(x))
        z_want = x.mean(dim=2).reshape(2, 3, 24)
        c_want, _ = gru(z_want)
    z, c = cpcprot.encode(params, jnp.asarray(ids), config)
    np.testing.assert_allclose(np.asarray(z), z_want.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(c), c_want.numpy(), atol=ATOL)


def test_albert_embedder_through_registry(tmp_path):
    """ProtAlbert entry is live: converted params run through BertEmbedder
    with the WordPiece tokenizer ([CLS]/[SEP] stripped)."""
    from knn_for_homology_tpu.models import bert
    from knn_for_homology_tpu.models.registry import BertEmbedder

    tiny = bert.BertConfig(
        vocab_size=30, d_model=32, d_ff=64, num_layers=2, num_heads=4,
        max_positions=64, pre_norm=False, share_layers=True, embed_dim=16,
        gelu_exact=False,
    )
    emb = BertEmbedder(
        arch="ProtAlbert BFD", params=bert.init_params(tiny, 3), config=tiny
    )
    seqs = ["MKVLA", "GDTRPA"]
    outs = list(emb.embed_per_residue(seqs))
    for seq, e in zip(seqs, outs):
        assert e.shape == (len(seq), 32)
        assert np.isfinite(e).all()


def test_elmo_conversion_matches_torch_bilm(tmp_path):
    """ELMo numeric oracle (VERDICT r1 #4): a hand-rolled torch bi-LM —
    Conv1d CharCNN + torch LSTMs with projection — whose weights are
    exported into the bilm-tf hdf5 layout (gate order [i,g,f,o], forget
    bias left out of B, [in, 4H] kernels); convert_elmo_from_hdf5 +
    models/elmo.py must reproduce all three layers."""
    h5py = pytest.importorskip("h5py")
    from knn_for_homology_tpu.models import elmo
    from knn_for_homology_tpu.models.convert import convert_elmo_from_hdf5

    torch.manual_seed(11)
    E, P, H, NH = 4, 16, 32, 1  # char embed, proj, lstm hidden, highways
    FILTERS = [(1, 8), (2, 8), (3, 16)]
    TOTAL = sum(n for _, n in FILTERS)
    N_LAYERS = 2

    char_embed = torch.randn(262, E) * 0.5
    convs = [torch.nn.Conv1d(E, n, w) for w, n in FILTERS]
    highways = [
        {
            "w_carry": torch.randn(TOTAL, TOTAL) * 0.1,
            "b_carry": torch.randn(TOTAL) * 0.1,
            "w_tr": torch.randn(TOTAL, TOTAL) * 0.1,
            "b_tr": torch.randn(TOTAL) * 0.1,
        }
        for _ in range(NH)
    ]
    w_proj = torch.randn(TOTAL, P) * 0.1
    b_proj = torch.randn(P) * 0.1
    # one torch LSTM per (direction, layer), with projection
    lstms = {
        (d, l): torch.nn.LSTM(P, H, proj_size=P, batch_first=True)
        for d in ("fwd", "bwd") for l in range(N_LAYERS)
    }
    for m in lstms.values():
        for p in m.parameters():
            p.data *= 0.5

    # ---- export into the bilm-tf hdf5 layout --------------------------
    def to_bilm_gates(t, axis):
        # torch gate order [i, f, g, o] -> bilm [i, g, f, o]
        i, f, g, o = np.split(t, 4, axis=axis)
        return np.concatenate([i, g, f, o], axis=axis)

    options = {
        "char_cnn": {
            "embedding": {"dim": E},
            "filters": [list(f) for f in FILTERS],
            "n_highway": NH,
        },
        "lstm": {
            "projection_dim": P,
            "dim": H,
            "n_layers": N_LAYERS,
            "cell_clip": 50.0,  # large: torch has no clipping
            "proj_clip": 50.0,
        },
    }
    (tmp_path / "options.json").write_text(json.dumps(options))
    with h5py.File(tmp_path / "weights.hdf5", "w") as fp:
        fp["char_embed"] = char_embed.numpy()
        for i, conv in enumerate(convs):
            # torch Conv1d weight [n_out, E, width] -> bilm [1, width, E, n_out]
            fp[f"CNN/W_cnn_{i}"] = (
                conv.weight.detach().numpy().transpose(2, 1, 0)[None]
            )
            fp[f"CNN/b_cnn_{i}"] = conv.bias.detach().numpy()
        for i, hw in enumerate(highways):
            fp[f"CNN_high_{i}/W_carry"] = hw["w_carry"].numpy()
            fp[f"CNN_high_{i}/b_carry"] = hw["b_carry"].numpy()
            fp[f"CNN_high_{i}/W_transform"] = hw["w_tr"].numpy()
            fp[f"CNN_high_{i}/b_transform"] = hw["b_tr"].numpy()
        fp["CNN_proj/W_proj"] = w_proj.numpy()
        fp["CNN_proj/b_proj"] = b_proj.numpy()
        for d, name in [("fwd", "RNN_0"), ("bwd", "RNN_1")]:
            for l in range(N_LAYERS):
                m = lstms[(d, l)]
                w_ih = m.weight_ih_l0.detach().numpy()  # [4H, P]
                w_hh = m.weight_hh_l0.detach().numpy()  # [4H, P] (proj)
                b = (
                    m.bias_ih_l0.detach().numpy()
                    + m.bias_hh_l0.detach().numpy()
                )
                b_bilm = to_bilm_gates(b, 0).copy()
                # bilm's LSTMCell adds forget_bias=1.0 at runtime; the dumped
                # B must therefore be 1.0 SHORT of torch's effective bias
                # (f sits at [2H:3H] in bilm's [i, g, f, o] layout)
                b_bilm[2 * H : 3 * H] -= 1.0
                base = f"{name}/RNN/MultiRNNCell/Cell{l}/LSTMCell"
                fp[f"{base}/W_0"] = np.concatenate(
                    [to_bilm_gates(w_ih.T, 1), to_bilm_gates(w_hh.T, 1)], 0
                )
                fp[f"{base}/B"] = b_bilm
                fp[f"{base}/W_P_0"] = (
                    m.weight_hr_l0.detach().numpy().T  # [P, H] -> [H, P]
                )

    # ---- torch oracle ---------------------------------------------------
    def char_rep(word_char_ids):
        # word_char_ids: list of raw bilm char ids for one "word"
        ids = torch.full((elmo.MAX_WORD_CHARS,), 260, dtype=torch.long)
        for j, c in enumerate(word_char_ids):
            ids[j] = c
        x = char_embed[ids].T[None]  # [1, E, W]
        feats = [
            torch.max(torch.tanh(conv(x)), dim=2).values for conv in convs
        ]
        h = torch.cat(feats, dim=1)  # [1, TOTAL]
        for hw in highways:
            g = torch.sigmoid(h @ hw["w_carry"] + hw["b_carry"])
            h = g * torch.relu(h @ hw["w_tr"] + hw["b_tr"]) + (1 - g) * h
        return (h @ w_proj + b_proj)[0]

    def oracle(seq):
        reps = [char_rep([258, ord(a), 259]) for a in seq]
        bos, eos = char_rep([258, 256, 259]), char_rep([258, 257, 259])
        token = torch.stack(reps)  # [L, P]
        ext = torch.stack([bos] + reps + [eos])  # [L+2, P]
        outs = {"fwd": [], "bwd": []}
        for d in ("fwd", "bwd"):
            x = ext if d == "fwd" else torch.flip(ext, [0])
            for l in range(N_LAYERS):
                y, _ = lstms[(d, l)](x[None])
                y = y[0]
                if l > 0:
                    y = y + x
                outs[d].append(y)
                x = y
        layers = [torch.cat([token, token], dim=1)]
        for l in range(N_LAYERS):
            fwd = outs["fwd"][l][1 : len(seq) + 1]
            bwd = torch.flip(outs["bwd"][l], [0])[1 : len(seq) + 1]
            layers.append(torch.cat([fwd, bwd], dim=1))
        return torch.stack(layers).detach().numpy()  # [3, L, 2P]

    # ---- ours: converted checkpoint, batched with padding ---------------
    config, params = convert_elmo_from_hdf5(
        tmp_path / "weights.hdf5", tmp_path / "options.json"
    )
    assert config.lstm_dim == H and config.proj_dim == P
    seqs = ["MKVLITGAG", "ACDEF"]
    max_len = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), max_len), dtype=np.int32)
    mask = np.zeros((len(seqs), max_len), dtype=bool)
    for r, s in enumerate(seqs):
        ids[r, : len(s)] = elmo.tokenize(s)
        mask[r, : len(s)] = True
    ours = np.asarray(
        elmo.encode(params, jnp.asarray(ids), jnp.asarray(mask), config)
    )  # [3, B, L, 2P]
    for r, s in enumerate(seqs):
        want = oracle(s)
        np.testing.assert_allclose(
            ours[:, r, : len(s)], want, atol=ATOL, rtol=1e-3
        )
