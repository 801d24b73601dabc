import json
import random

import numpy as np
import pytest

from knn_for_homology_tpu.data import (
    Dataset,
    build_domain_ranges,
    get_homologous_proteins,
    make_pfam_subset,
    make_subset_by_families,
    make_slices,
    slice_sequence,
    slices_per_protein,
)
from knn_for_homology_tpu.data.cath import load_mapping, parse_clf, canonical_cath_id


@pytest.fixture()
def pfam_a_fixture(tmp_path):
    """Synthetic Pfam-A: 5 families, family sizes 30/25/20/12/5; headers in
    the real layout '>ID/start-stop ACC.1 PFxxxxx.7;Name;'."""
    rng = random.Random(9)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    path = tmp_path / "Pfam-A.fasta"
    with open(path, "w") as fp:
        for fam_idx, size in enumerate([30, 25, 20, 12, 5]):
            for member in range(size):
                pid = f"P{fam_idx}_{member}"
                start = rng.randint(1, 50)
                stop = start + rng.randint(20, 60)
                seq = "".join(rng.choice(aas) for _ in range(stop - start + 1))
                fp.write(
                    f">{pid}/{start}-{stop} {pid}.1 PF{fam_idx:05d}.7;Fam{fam_idx};\n"
                )
                fp.write(seq + "\n")
    return path


def test_make_pfam_subset_structure_and_determinism(pfam_a_fixture, tmp_path):
    out1 = tmp_path / "sub1"
    out2 = tmp_path / "sub2"
    out3 = tmp_path / "sub3"
    n1 = make_pfam_subset(out1, 2020, pfam_a_fixture, None, 7, 13)
    n2 = make_pfam_subset(out2, 2020, pfam_a_fixture, None, 7, 13)
    n3 = make_pfam_subset(out3, 99, pfam_a_fixture, None, 7, 13)
    # only families with > min+max members qualify: sizes 30 and 25
    assert n1 == n2 == n3 == 2
    assert (out1 / "train.fasta").read_text() == (out2 / "train.fasta").read_text()
    assert (out1 / "train.fasta").read_text() != (out3 / "train.fasta").read_text()

    ids_to_family = json.loads((out1 / "ids_to_family.json").read_text())
    train_ids = json.loads((out1 / "train.json").read_text())
    test_ids = json.loads((out1 / "test.json").read_text())
    # each picked family contributed exactly min+max = 20 entries
    assert len(train_ids) + len(test_ids) == 2 * 20
    for ids in (train_ids, test_ids):
        for i in ids:
            assert i in ids_to_family
    # per family, the train split size is within [min, max]
    from collections import Counter

    train_fams = Counter(ids_to_family[i] for i in train_ids)
    for fam, count in train_fams.items():
        assert 7 <= count <= 13


def test_make_subset_by_families(synthetic_dataset, tmp_path):
    out = tmp_path / "subset"
    make_subset_by_families(synthetic_dataset, out, 3)
    sub = Dataset.from_dir(out)
    fams = {sub.ids_to_family[i] for i in sub.train_ids}
    assert len(fams) == 3
    # npy rows stay aligned with the id lists
    assert sub.load_train().shape[0] == len(sub.train_ids)
    full = Dataset.from_dir(synthetic_dataset)
    row = full.train_ids.index(sub.train_ids[0])
    np.testing.assert_array_equal(sub.load_train()[0], full.load_train()[row])


def test_build_domain_ranges(tmp_path):
    fasta = tmp_path / "d.fasta"
    fasta.write_text(
        ">K9RCX8_9CYAN/166-202\nAAAA\n>K9RCX8_9CYAN/1-50\nCCCC\n>OTHER/5-9\nDDDD\n"
    )
    ranges = build_domain_ranges(fasta)
    assert ranges["K9RCX8_9CYAN"] == [
        (166, 202, "K9RCX8_9CYAN/166-202"),
        (1, 50, "K9RCX8_9CYAN/1-50"),
    ]
    assert ranges["OTHER"] == [(5, 9, "OTHER/5-9")]


def test_homologous_proteins_closure():
    p2d = {
        "A": [("F1", (0, 10)), ("F2", (20, 30))],
        "B": [("F1", (0, 10))],
        "C": [("F2", (5, 15))],
        "D": [("F3", (0, 9))],
    }
    hom = get_homologous_proteins(p2d)
    assert hom["A"] == {"B", "C"}
    assert hom["B"] == {"A"}
    assert hom["C"] == {"A"}
    assert hom["D"] == set()


def test_slice_sequence_reference_semantics():
    # stride = 600-200 = 400; short proteins still get one slice
    # range(0, max(200, len-overlap), stride): len 1000 → starts 0, 400
    assert [s for s, _ in slice_sequence("A" * 1000)] == [0, 400]
    assert [s for s, _ in slice_sequence("A" * 1300)] == [0, 400, 800]
    assert [s for s, _ in slice_sequence("A" * 150)] == [0]
    starts_and_windows = list(slice_sequence("ABCDEFGHIJ" * 100))
    assert all(len(w) <= 600 for _, w in starts_and_windows)
    assert starts_and_windows[0][1] == ("ABCDEFGHIJ" * 100)[:600]


def test_make_slices_and_assembly_map(tmp_path):
    fasta = tmp_path / "full.fasta"
    fasta.write_text(">x P1\n" + "A" * 900 + "\n>y P2\n" + "C" * 100 + "\n")
    out = tmp_path / "slices.fasta"
    n = make_slices(fasta, out)
    text = out.read_text().splitlines()
    ids = [line[1:] for line in text[::2]]
    assert n == len(ids) == 3  # P1: starts 0,400; P2: start 0
    assert ids == ["P1-0", "P1-400", "P2-0"]
    per_protein = slices_per_protein(ids)
    assert per_protein == {"P1": [0, 1], "P2": [2]}


def test_clf_parsing(tmp_path):
    clf = tmp_path / "cath-domain-list.txt"
    clf.write_text(
        "# comment line\n"
        "1oaiA00     1    10     8    10     1     1     1     1     1"
        "    59 1.000\n"
        "16vpA00     1    10     8    10     2     1     1     1     1"
        "    60 2.000\n"
        "2zzzB01     2     4     6     8     1     1     1     1     1"
        "    99 1.500\n"
    )
    codes = parse_clf(clf)
    assert codes["1oaiA00"] == "1.10.8.10"
    assert codes["2zzzB01"] == "2.4.6.8"
    levels, arr = load_mapping(["1oaiA00", "2zzzB01"], clf)
    # index 0 = full H code … index 3 = class (reference ordering)
    assert levels["1oaiA00"] == ("1.10.8.10", "1.10.8", "1.10", "1")
    assert arr.shape == (2, 4)
    assert canonical_cath_id("cath|4_2_0|16vpA00/1-100") == "16vpA00"
