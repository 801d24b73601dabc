"""One-command paper-reproduction rehearsal (VERDICT r2 #5): the chain
fasta + synthetic checkpoints → embed → search → evaluate → rendered
figures+tables tree must run end-to-end and produce the reference's
more_sensitive/ layout."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def tiny_cath(tmp_path):
    rng = np.random.RandomState(0)
    n_fam, per_fam, length = 6, 6, 30
    n = n_fam * per_fam
    fams = np.repeat(np.arange(n_fam), per_fam)
    fasta = tmp_path / "cath20.fasta"
    aas = "ACDEFGHIKLMNPQRSTVWY"
    # family-correlated sequences so AA composition clusters them a bit
    with open(fasta, "w") as fp:
        for i in range(n):
            base = rng.RandomState if False else None
            seed = np.random.RandomState(int(fams[i]))
            seq = "".join(
                aas[j]
                for j in (seed.randint(0, 20, length) + rng.randint(0, 3, length)) % 20
            )
            fp.write(f">cath|4_2_0|dom{i:03d}/1-{length}\n{seq}\n")
    clf = tmp_path / "clf.txt"
    with open(clf, "w") as fp:
        for i in range(n):
            name = f"dom{i:03d}"
            c, a, t, h = 1, 10, 8, int(fams[i]) + 1
            fp.write(
                f"{name:<7}{c:>6}{a:>6}{t:>6}{h:>6}     1     1     1     1"
                f"     1  {length}.000\n"
            )
    return fasta, clf


def _tiny_t5_checkpoint(path: Path):
    from knn_for_homology_tpu.models import t5
    from knn_for_homology_tpu.models.convert import save_params

    cfg = t5.TINY
    save_params(
        t5.init_params(cfg, 0),
        path,
        meta={
            "config": {
                "vocab_size": cfg.vocab_size, "d_model": cfg.d_model,
                "d_kv": cfg.d_kv, "d_ff": cfg.d_ff,
                "num_layers": cfg.num_layers, "num_heads": cfg.num_heads,
            }
        },
    )


def test_reproduce_cath_tree(tmp_path, tiny_cath):
    from knn_for_homology_tpu.pipelines.reproduce import reproduce_cath

    fasta, clf = tiny_cath
    checkpoints = tmp_path / "checkpoints"
    checkpoints.mkdir()
    _tiny_t5_checkpoint(checkpoints / "ProtT5 XL U50")

    out = tmp_path / "more_sensitive"
    report = reproduce_cath(
        fasta, clf, out, checkpoints=checkpoints, hits=5, platform="cpu"
    )
    figures = out / "more_sensitive" if False else out / "cath-figures"
    # the leaderboard tables, reference layout
    acc = (figures / "accuracies.md").read_text()
    assert acc.splitlines()[0].split("|")[2].strip() == "normalized"
    assert "ProtT5 XL U50" in acc and "AA Composition" in acc
    assert (figures / "accuracies_euclidean.md").exists()
    # rendered endfig family + raw npz beside it
    assert (figures / "superfamily-vs-accuracy.svg").exists()
    assert (figures / "superfamily-vs-accuracy-data.npz").exists()
    assert (figures / "length-vs-accuracy.svg").exists()
    # both embedders made it into the search stage
    hits = np.load(out / "cath-data" / "hits_cosine.npz")
    assert "ProtT5 XL U50" in hits and "AA Composition" in hits
    # idempotency: a second run reuses every artifact without error
    report2 = reproduce_cath(
        fasta, clf, out, checkpoints=checkpoints, hits=5, platform="cpu"
    )
    assert [r[0] for r in report2["cosine"]["accuracies"]] == [
        r[0] for r in report["cosine"]["accuracies"]
    ]


def test_reproduce_uniref90_tables(tmp_path):
    from knn_for_homology_tpu.pipelines.reproduce import reproduce_uniref90

    knn = {
        "T0001": ["a", "b", "c", "d"],
        "T0002": ["x", "y"],
    }
    mm = {"T0001": ["b", "c", "z"], "T0002": ["q"]}
    neff = {"T0001": 24806.6, "T0002": 1.5}
    kj = tmp_path / "knn.json"
    mj = tmp_path / "mm.json"
    nj = tmp_path / "neff.json"
    kj.write_text(json.dumps(knn))
    mj.write_text(json.dumps(mm))
    nj.write_text(json.dumps(neff))
    reproduce_uniref90(kj, mj, tmp_path, neff_json=nj, cutoffs=(2, 3))
    figs = tmp_path / "uniref90-figures"
    overlap = (figs / "uniref90-overlap.md").read_text()
    lines = overlap.strip().splitlines()
    assert lines[0].split("|")[1].strip() == "hits"
    # cutoff 2: T0001 top2={a,b} -> both 1, knn-only 1; mm-only 2;
    #           T0002 top2={x,y} -> knn-only 2, mm-only 1
    row2 = [c.strip() for c in lines[2].split("|")[1:-1]]
    assert row2 == ["2", "3", "1", "3"]
    neff_md = (figs / "uniref90-neff-hits.md").read_text()
    assert "T0001" in neff_md and "24806.6" in neff_md


def test_overlap_counts_semantics():
    from knn_for_homology_tpu.eval.overlap import overlap_counts

    knn = {"q": [1, 2, 3, 4, 5]}
    mm = {"q": {2, 4, 9}}
    (c3,) = overlap_counts(knn, mm, cutoffs=(3,))
    assert c3 == {"hits": 3, "knn_only": 2, "both": 1, "mm_only": 2}


def test_reproduce_pfam_proteins_tree(tmp_path):
    """Full-protein reproduce chain with a synthetic checkpoint: embed →
    flat index k-search → proteins-figures/ tree."""
    from knn_for_homology_tpu.pipelines.reproduce import (
        reproduce_pfam_proteins,
    )

    rng = np.random.RandomState(4)
    n_fam, per_fam, length = 4, 8, 40
    n = n_fam * per_fam
    aas = "ACDEFGHIKLMNPQRSTVWY"
    full_fasta = tmp_path / "full.fasta"
    pfam_a = tmp_path / "pfam_a.fasta"
    with open(full_fasta, "w") as full, open(pfam_a, "w") as pa:
        for i in range(n):
            fam = i // per_fam
            seed = np.random.RandomState(fam)
            seq = "".join(aas[j] for j in seed.randint(0, 20, length))
            full.write(f">P{i:03d}\n{seq}\n")
            # Pfam-A style header carrying the family annotation
            # (data/pfam.py:HEADER_RE: ">ID/start-stop ACC.v FAM.v;name;")
            pa.write(
                f">P{i:03d}/1-{length} P{i:03d}.1 PF{fam:05d}.1;Fam{fam};\n"
                f"{seq}\n"
            )
    checkpoints = tmp_path / "checkpoints"
    checkpoints.mkdir()
    _tiny_t5_checkpoint(checkpoints / "ProtT5 XL U50")

    out = tmp_path / "more_sensitive"
    metrics = reproduce_pfam_proteins(
        full_fasta, pfam_a, out, checkpoints=checkpoints, k=20,
    )
    figures = out / "proteins-figures"
    assert (figures / "metrics.json").exists()
    assert (figures / "accuracy_over_hits-data.npz").exists()
    assert "auc1" in metrics
    # identical sequences within a family → embeddings cluster → high AUC1
    assert metrics["auc1"] > 0.9, metrics
