import json
from pathlib import Path

import numpy as np
import pytest

from knn_for_homology_tpu.data import Dataset
from knn_for_homology_tpu.pipelines import harness
from knn_for_homology_tpu.search import LSHIndex


def test_hit_count_sweep_and_tables(synthetic_dataset, tmp_path):
    ds = Dataset.from_dir(synthetic_dataset)
    index = LSHIndex(dim=32, nbits=256).add(ds.load_train())
    records = harness.hit_count_sweep(ds, index, hit_counts=(20, 5), rescore=False)
    assert [r["hits"] for r in records] == [20, 5]
    assert all(0 <= r["auc1"] <= 1 for r in records)
    out = tmp_path / "sweep"
    harness.write_sweep_table(records, out)
    assert (tmp_path / "sweep.csv").exists()
    md = (tmp_path / "sweep.md").read_text()
    assert md.startswith("| hits |")


def test_hit_count_sweep_with_rescoring(synthetic_dataset):
    ds = Dataset.from_dir(synthetic_dataset)
    index = LSHIndex(dim=32, nbits=256).add(ds.load_train())
    records = harness.hit_count_sweep(ds, index, hit_counts=(6,), rescore=True)
    assert records[0]["align_time"] > 0
    assert 0 <= records[0]["auc1"] <= 1


def test_layer_transform_sweep(synthetic_dataset):
    ds = Dataset.from_dir(synthetic_dataset, hits=6)
    rng = np.random.RandomState(7)
    train = ds.load_train()
    test = ds.load_test()
    # layer 1 = the real embeddings, layers 0/2 noise
    train_layers = np.stack([rng.randn(*train.shape), train, rng.randn(*train.shape)])
    test_layers = np.stack([rng.randn(*test.shape), test, rng.randn(*test.shape)])
    records = harness.layer_transform_sweep(ds, train_layers, test_layers, hits=6)
    names = [r[0] for r in records]
    assert set(names) == set(harness.LAYER_TRANSFORMS)
    # the informative single layer must win over pure-noise layers
    by_name = {r[0]: r[1] for r in records}
    assert by_name["LSTM1"] > by_name["CharCNN"]
    assert by_name["LSTM1"] > by_name["LSTM2"]
    assert records[0][0] in ("LSTM1", "Concat")


def test_lstm1_vs_sum_on_reference_fixtures(reference_data_dir):
    ds1 = Dataset.from_dir(reference_data_dir / "pfam-20-10", hits=10)
    ds2 = Dataset.from_dir(reference_data_dir / "pfam-20-10-sum", hits=10)
    out = harness.lstm1_vs_sum(ds1, ds2, hits=10)
    assert set(out) == {"LSTM1", "Sum"}
    # fixture provenance: LSTM1 embeddings beat the summed layers
    assert out["LSTM1"] >= out["Sum"]


def test_embed_cli_with_converted_checkpoint(tmp_path):
    """Full convert→load→embed CLI flow on a tiny T5 checkpoint."""
    from knn_for_homology_tpu.models import t5
    from knn_for_homology_tpu.models.convert import save_params
    from knn_for_homology_tpu.pipelines.embed import main as embed_main

    config = t5.TINY
    params = t5.init_params(config, seed=0)
    ckpt = tmp_path / "tiny_t5.npz"
    meta = {
        "config": {
            "vocab_size": config.vocab_size,
            "d_model": config.d_model,
            "d_kv": config.d_kv,
            "d_ff": config.d_ff,
            "num_layers": config.num_layers,
            "num_heads": config.num_heads,
        }
    }
    save_params(params, ckpt, meta=meta)

    fasta = tmp_path / "in.fasta"
    fasta.write_text(">a\nMKTAYIAK\n>b\nACDEFGHIKLMNP\n")
    npy = tmp_path / "out.npy"
    embed_main(
        [
            "embed", str(fasta), str(npy),
            "--checkpoint", str(ckpt), "--batch-size", "256",
        ]
    )
    out = np.load(npy)
    assert out.shape == (2, config.d_model)
    assert (tmp_path / "out.time.txt").exists()
    assert json.loads((tmp_path / "out.json").read_text()) == ["a", "b"]


def test_embed_domains_cli(tmp_path):
    from knn_for_homology_tpu.models import elmo
    from knn_for_homology_tpu.models.convert import save_params
    from knn_for_homology_tpu.pipelines.embed import main as embed_main

    config = elmo.TINY_ELMO
    ckpt = tmp_path / "tiny_elmo.npz"
    save_params(
        elmo.init_params(config, seed=0),
        ckpt,
        meta={
            "config": {
                "char_embed_dim": config.char_embed_dim,
                "filters": [list(f) for f in config.filters],
                "n_highway": config.n_highway,
                "proj_dim": config.proj_dim,
                "lstm_dim": config.lstm_dim,
                "n_lstm_layers": config.n_lstm_layers,
            }
        },
    )
    full = tmp_path / "full.fasta"
    full.write_text(">P1\n" + "ACDEFGHIKL" * 6 + "\n")
    train_f = tmp_path / "train.fasta"
    train_f.write_text(">P1/1-20\n" + "ACDEFGHIKL" * 2 + "\n")
    test_f = tmp_path / "test.fasta"
    test_f.write_text(">P1/21-40\n" + "ACDEFGHIKL" * 2 + "\n")
    out_dir = tmp_path / "domains"
    d = 2 * config.proj_dim
    embed_main(
        [
            "embed-domains", str(full), str(train_f), str(test_f), str(out_dir),
            "--checkpoint", str(ckpt),
            "--feature-slice", str(d), str(2 * d),  # "LSTM1" slice
        ]
    )
    train_npy = np.load(out_dir / "train.npy")
    assert train_npy.shape == (1, d)
    assert json.loads((out_dir / "train.json").read_text()) == ["P1/1-20"]
    full_npy = np.load(out_dir / "train_full.npy")
    assert full_npy.shape == (1, 3 * d)
    # the sliced features are exactly the middle (LSTM1) block
    np.testing.assert_allclose(train_npy[0], full_npy[0, d : 2 * d])


def test_embed_all_sweep_with_checkpoints(tmp_path):
    """embed-all drives each available embedder in a subprocess (crash
    isolation), skips missing checkpoints + existing outputs, and writes
    the AA-composition baseline inline — the reference's sweep semantics."""
    import subprocess
    import sys

    from knn_for_homology_tpu.models import t5
    from knn_for_homology_tpu.models.convert import save_params
    from knn_for_homology_tpu.pipelines.embed import main as embed_main

    ckpts = tmp_path / "ckpts"
    ckpts.mkdir()
    cfg = t5.TINY
    save_params(
        t5.init_params(cfg, 0),
        ckpts / "ProtT5 XL U50",
        meta={
            "config": {
                "vocab_size": cfg.vocab_size, "d_model": cfg.d_model,
                "d_kv": cfg.d_kv, "d_ff": cfg.d_ff,
                "num_layers": cfg.num_layers, "num_heads": cfg.num_heads,
            }
        },
    )
    fasta = tmp_path / "in.fasta"
    fasta.write_text(">a\nMKTAYIAK\n>b\nACDEFG\n")
    out = tmp_path / "sweep"
    embed_main(
        [
            "--platform", "cpu",
            "embed-all", str(fasta), str(out), "--checkpoints", str(ckpts),
        ]
    )
    assert (out / "AA Composition.npy").exists()
    t5_npy = out / "ProtT5 XL U50.npy"
    assert t5_npy.exists()
    assert np.load(t5_npy).shape == (2, cfg.d_model)
    assert (out / "ProtT5 XL U50.time2.txt").exists()
    assert (out / "ids.json").exists()
    # idempotency: second run must not recompute (mtime unchanged)
    before = t5_npy.stat().st_mtime_ns
    embed_main(
        [
            "--platform", "cpu",
            "embed-all", str(fasta), str(out), "--checkpoints", str(ckpts),
        ]
    )
    assert t5_npy.stat().st_mtime_ns == before
