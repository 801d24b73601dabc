import json

import numpy as np
import pytest

from knn_for_homology_tpu.pipelines import benchmark, cath, layer_mix, reverse
from knn_for_homology_tpu.pipelines.pfam_proteins import (
    build_and_search,
    evaluate_protein_hits,
)
from knn_for_homology_tpu.pipelines.slices_pipeline import (
    evaluate_slice_hits,
    search_slices,
    slice_domains,
)


def test_benchmark_cli_native_aligner(reference_data_dir, tmp_path, monkeypatch):
    """The end-to-end CLI on the reference's pfam-20-10 (figures off; the
    hybrid uses the native TPU aligner since mmseqs is absent)."""
    import shutil

    ds_dir = tmp_path / "pfam-20-10"
    shutil.copytree(reference_data_dir / "pfam-20-10", ds_dir)
    results = benchmark.run(ds_dir, hits=10, figures=False)
    names = [r[0] for r in results]
    assert names[:2] == ["k-NN", "k-NN + Alignment"]
    knn_auc1 = np.mean(results[0][1])
    align_auc1 = np.mean(results[1][1])
    assert knn_auc1 == 0.871  # golden
    assert align_auc1 >= 0.892  # native SW hybrid == mmseqs golden 0.8925


def test_cath_search_and_save(tmp_path):
    rng = np.random.RandomState(2)
    np.save(tmp_path / "MethodA.npy", rng.randn(40, 16).astype(np.float16))
    cath.search_and_save(tmp_path, hits=5)
    for metric in ("cosine", "euclidean"):
        hits = np.load(tmp_path / f"hits_{metric}.npz")
        scores = np.load(tmp_path / f"scores_{metric}.npz")
        assert hits["MethodA"].shape == (40, 5)
        assert scores["MethodA"].shape == (40, 5)
        # self hits stripped
        assert not np.any(hits["MethodA"] == np.arange(40)[:, None])
        assert (tmp_path / f"MethodA.{metric}-search-time.txt").exists()


def test_cath_evaluation_top1():
    # 3 families of sizes 3/2/1; family 2 (singleton) is impossible
    ids = np.asarray(["a", "b", "c", "d", "e", "f"])
    codes = ["1.1.1.1"] * 3 + ["2.2.2.2"] * 2 + ["3.3.3.3"]
    levels = {
        i: tuple(c.rsplit(".", k)[0] for k in range(4))
        for i, c in zip(ids, codes)
    }
    array = np.asarray([levels[i] for i in ids])
    ev = cath.CathEvaluation(ids, levels, array)
    assert ev.is_possible.tolist() == [True] * 5 + [False]
    assert ev.families_count == 2
    # hits: a..e find a same-family member; f finds anything (impossible)
    hits = np.asarray([[1], [0], [0], [4], [3], [0]])
    correct_all = ev.compute_is_correct(hits)
    raw, norm = ev.top1(correct_all)
    assert raw == 1.0
    assert abs(norm - 1.0) < 1e-12
    # one family entirely wrong
    hits_bad = np.asarray([[3], [3], [3], [4], [3], [0]])
    raw_b, norm_b = ev.top1(ev.compute_is_correct(hits_bad))
    assert abs(raw_b - 2 / 5) < 1e-12  # only the size-2 family correct
    assert abs(norm_b - 0.5) < 1e-12  # one of two families
    table = ev.format_table(ev.accuracy_table({"M": hits, "Bad": hits_bad}))
    # reference accuracies.md layout: blank-header name column, then
    # normalized | raw (cells space-padded like pandas.to_markdown)
    assert "| M " in table and "| Bad " in table
    assert table.splitlines()[0].split("|")[2].strip() == "normalized"
    assert table.splitlines()[1].startswith("|:")


def test_layer_mix_sweep_picks_informative_layer():
    rng = np.random.RandomState(3)
    n, d = 60, 16
    fams = np.repeat(np.arange(6), 10)
    centroids = rng.randn(6, d) * 8
    informative = centroids[fams] + rng.randn(n, d)
    noise1 = rng.randn(n, d)
    noise2 = rng.randn(n, d)
    weights, acc = layer_mix.layer_mix_sweep(
        [noise1, informative, noise2], fams, step=0.5
    )
    assert len(weights) == len(acc) == 6
    best = weights[np.argmax(acc)]
    # the best mix should lean on the informative layer (index 1)
    assert best[1] >= 0.5
    assert acc.max() > 0.9


def test_reverse_control(tmp_path):
    from knn_for_homology_tpu.data.fasta import read_fasta

    src = tmp_path / "src.fasta"
    rng = np.random.RandomState(4)
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    with open(src, "w") as fp:
        for i in range(30):
            fp.write(f">P{i}\n" + "".join(rng.choice(aas, 40)) + "\n")
    paths = reverse.make_control_fastas(src, tmp_path / "ctl", n_samples=20, seed=1)
    fwd = read_fasta(paths["forward"])
    rev = read_fasta(paths["reversed"])
    shuf = read_fasta(paths["shuffled"])
    assert len(fwd) == 20
    for name in fwd:
        assert rev[name] == fwd[name][::-1]
        assert sorted(shuf[name]) == sorted(fwd[name])

    # separation: three clearly shifted populations
    emb = {
        "forward": rng.randn(50, 8),
        "reversed": rng.randn(50, 8) + 5,
        "shuffled": rng.randn(50, 8) - 5,
    }
    out = reverse.separation_analysis(emb)
    assert out["centroid_dist_forward_reversed"] > 2
    assert out["centroid_dist_reversed_shuffled"] > 4


def test_pfam_proteins_flow(tmp_path):
    rng = np.random.RandomState(5)
    n, d = 50, 24
    fams = np.repeat(np.arange(5), 10)
    emb = (rng.randn(5, d) * 10)[fams] + rng.randn(n, d)
    ids = [f"P{i}" for i in range(n)]
    homologous = {
        f"P{i}": {f"P{j}" for j in range(n) if fams[j] == fams[i] and j != i}
        for i in range(n)
    }
    result = build_and_search(emb.astype(np.float32), "flat", k=11)
    from knn_for_homology_tpu.eval.analysis import remove_self_hit_lossy

    hits, scores, bogus = remove_self_hit_lossy(
        result["hits"], result["scores"], np.arange(n)
    )
    metrics = evaluate_protein_hits(hits, ids, homologous, recall_k=9)
    assert metrics["auc1"] > 0.9
    assert metrics["recall@9"] > 0.9


def test_slices_flow():
    rng = np.random.RandomState(6)
    # 4 proteins, 2 families; each protein → 2 slices
    slice_ids = [f"P{p}-{s}" for p in range(4) for s in (0, 400)]
    fams = [0, 0, 1, 1]
    d = 16
    centroids = rng.randn(2, d) * 9
    emb = np.stack(
        [centroids[fams[p]] + rng.randn(d) * 0.5 for p in range(4) for _ in range(2)]
    ).astype(np.float32)
    homologous = {
        f"P{p}": {f"P{q}" for q in range(4) if fams[q] == fams[p] and q != p}
        for p in range(4)
    }
    p2d = {f"P{p}": [(f"F{fams[p]}", (10, 200))] for p in range(4)}
    hits, scores = search_slices(emb, k=7)
    m = evaluate_slice_hits(slice_ids, hits, p2d, homologous)
    # only the start-0 slices contain the (10, 200) domain fully
    assert m["n_evaluated"] == 4
    assert m["slice_auc1"] == 1.0
    # matching vs intersecting distinction
    matching, intersecting = slice_domains("P0-400", {"P0": [(("F0"), (10, 500))]})
    assert matching == set() and intersecting == {"F0"}


def test_figures_smoke(tmp_path):
    """Figure utilities produce deterministic files + raw npz dumps."""
    from knn_for_homology_tpu.eval.figures import (
        endfig,
        figure_tp_cumulative,
        make_figure,
        save_raw,
    )

    make_figure(
        tmp_path, [[0.1, 0.9, 0.5], [0.2, 0.4, 0.8]], ["a", "b"],
        "AUC1", "smoke.jpg", svg=True,
    )
    assert (tmp_path / "smoke.jpg").exists()
    assert (tmp_path / "smoke.svg").exists()
    data = np.load(tmp_path / "smoke-data.npz")
    np.testing.assert_allclose(data["a"], [0.1, 0.9, 0.5])

    figure_tp_cumulative(
        tmp_path, ["m"], [np.asarray([0.1, 0.5, 0.9])], "tpc"
    )
    assert (tmp_path / "tpc.svg").exists()

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.plot([0, 1], [0, 1])
    endfig(tmp_path, "ef")
    for suffix in (".svg", ".jpg", ".eps"):
        assert (tmp_path / f"ef{suffix}").exists()
    save_raw(tmp_path, "raw", x=np.arange(3))
    assert (tmp_path / "raw.npz").exists()


def test_cath_evaluate_and_report(tmp_path):
    """End-to-end CATH paper-layer driver on synthetic data incl. the
    MMseqs2-merge analyses."""
    rng = np.random.RandomState(8)
    n, d = 60, 16
    fams = np.repeat(np.arange(10), 6)
    emb = (rng.randn(10, d) * 9)[fams] + rng.randn(n, d)
    ids = [f"dom{i:03d}" for i in range(n)]
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    np.save(data_dir / "MethodA.npy", emb.astype(np.float32))
    np.save(data_dir / "MethodB.npy", rng.randn(n, d).astype(np.float32))
    import json as _json

    (data_dir / "ids.json").write_text(
        _json.dumps([f"cath|4_2_0|{i}/1-50" for i in ids])
    )
    clf = tmp_path / "clf.txt"
    with open(clf, "w") as fp:
        for i, name in enumerate(ids):
            c, a, t, h = 1, 10, 8, int(fams[i]) + 1
            fp.write(
                f"{name:<7}{c:>6}{a:>6}{t:>6}{h:>6}     1     1     1     1"
                "     1    50 1.000\n"
            )
    cath.search_and_save(data_dir, hits=5)
    mm = {
        "is_correct_top1": rng.rand(n) > 0.5,
        "e_values_top1": 10.0 ** rng.uniform(-10, 2, n),
    }
    report = cath.evaluate_and_report(
        data_dir, clf, tmp_path / "figs", mmseqs_results=mm
    )
    table = (tmp_path / "figs" / "accuracies.md").read_text()
    assert "MethodA" in table and "MethodB" in table
    # clustered method must beat random noise, and rank first
    assert report["accuracies"][0][0] == "MethodA"
    assert report["accuracies"][0][1] > 0.9
    assert (tmp_path / "figs" / "superfamily-vs-accuracy.npz").exists()
    assert (tmp_path / "figs" / "combining-mmseqs-and-knn-raw-data.npz").exists()
    # the rendered endfig families (VERDICT r1 #5): svg+jpg+eps + npz each
    for fam in [
        "superfamily-vs-accuracy",
        "superfamily-vs-delta-accuracy",
        "combining-mmseqs-and-knn-raw",
        "combining-mmseqs-and-knn-normalized",
        "coverage-vs-accuracy",
        "e_value_vs_cosine_scatter",
    ]:
        for suffix in (".svg", ".jpg", ".eps", ".npz"):
            assert (tmp_path / "figs" / f"{fam}{suffix}").exists(), fam + suffix
    assert "confusion" in report and "correlation" in report
    assert report["per_level"]["MethodA"]["H"] > 0.9


def _install_fake_mmseqs(tmp_path, monkeypatch):
    import stat
    import sys
    from pathlib import Path as P

    stub = tmp_path / "mmseqs"
    fake = P(__file__).parent / "fake_mmseqs.py"
    stub.write_text(f"#!/bin/sh\nexec {sys.executable} {fake} \"$@\"\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("MMSEQS_PATH", str(stub))
    return stub


def test_benchmark_cli_mmseqs_aligner(reference_data_dir, tmp_path, monkeypatch):
    """C28 with the mmseqs bridge: kNN → prefilter DB → `mmseqs align`
    (fake) → result parse → eval, plus the MMseqs2 baseline row."""
    import shutil

    _install_fake_mmseqs(tmp_path, monkeypatch)
    ds_dir = tmp_path / "pfam-20-10"
    shutil.copytree(reference_data_dir / "pfam-20-10", ds_dir)
    results = benchmark.run(ds_dir, hits=10, aligner="mmseqs", figures=False)
    names = [r[0] for r in results]
    assert names == ["k-NN", "k-NN + Alignment", "MMseqs2"]
    # the fake align preserves kNN ranking → goldens hold through the bridge
    assert abs(np.mean(results[1][1]) - 0.871) < 1e-9


def test_pfam_domains_run(reference_data_dir, tmp_path, monkeypatch):
    """C24 end to end: LSH search, native rescoring, (fake-)mmseqs plain +
    iterated baselines, the E-value cutoff sweep, and figures."""
    import shutil

    _install_fake_mmseqs(tmp_path, monkeypatch)
    ds_dir = tmp_path / "pfam-20-10"
    shutil.copytree(reference_data_dir / "pfam-20-10", ds_dir)
    from knn_for_homology_tpu.pipelines import pfam_domains

    summary = pfam_domains.run(
        ds_dir, hits=100, lsh_bits=512, figures_dir=tmp_path / "figs",
        rescore_hits=10,
    )
    # every number in the reference's result block (pfam/pfam.py:456-459:
    # per-method AUC1 + TP@10 + TP@300, combined) plus the TP-set overlap
    # (pfam/pfam.py:349-370) must be emitted
    for key in (
        "knn_auc1", "knn_tp", "knn_tp10", "knn_tp300",
        "knn_align_auc1", "knn_align_tp10", "knn_align_tp300",
        "mmseqs_auc1", "mmseqs_tp10", "mmseqs_tp300",
        "mmseqs_iterated_auc1", "mmseqs_iterated_tp300",
        "combined_best", "combined_auc1", "combined_tp10", "combined_tp300",
        "tp_overlap_only_knn", "tp_overlap_both", "tp_overlap_only_mmseqs",
    ):
        assert key in summary, key
    assert 0 <= summary["knn_auc1"] <= 1
    assert summary["knn_align_auc1"] >= summary["knn_auc1"] - 0.05
    # TP@300 dominates TP@10 (monotone in rank depth)
    assert summary["knn_tp300"] >= summary["knn_tp10"] - 1e-12
    assert summary["combined_tp300"] >= summary["combined_tp10"] - 1e-12
    # overlap fractions are fractions of all relevant pairs
    assert 0 <= summary["tp_overlap_both"] <= 1
    assert (
        summary["tp_overlap_only_knn"]
        + summary["tp_overlap_both"]
        + summary["tp_overlap_only_mmseqs"]
        <= 2.0
    )
    assert (tmp_path / "figs" / "pfam_auc1.jpg").exists()
    assert (tmp_path / "figs" / "tp_cumulative.npz").exists()
    assert (tmp_path / "figs" / "combining-mmseqs-and-knn.npz").exists()
    pr = np.load(tmp_path / "figs" / "precision_recall.npz")
    for label in ("mmseqs", "knn", "knn_aligned"):
        for lim in ("first_10", "300"):
            assert f"{label}_{lim}_precision" in pr
            assert f"{label}_{lim}_recall" in pr
    # merged-by-E combined ranking: AUC1 consistency between the dedicated
    # merged_auc1 and the row-based evaluation of merge_ranked_rows is
    # covered in test_analysis; here assert it lands in a sane band
    assert 0 <= summary["combined_auc1"] <= 1


def test_pfam_proteins_run_with_merge_and_figures(tmp_path):
    from knn_for_homology_tpu.pipelines import pfam_proteins

    rng = np.random.RandomState(9)
    n, d = 40, 16
    fams = np.repeat(np.arange(4), 10)
    emb = ((rng.randn(4, d) * 10)[fams] + rng.randn(n, d)).astype(np.float32)
    npy = tmp_path / "full_sequences.npy"
    np.save(npy, emb)
    ids = [f"P{i}" for i in range(n)]
    p2d = {f"P{i}": [(f"F{fams[i]}", (0, 50))] for i in range(n)}
    # fake mmseqs results: first same-family neighbour with a great E-value
    mm_hits, mm_evs = [], []
    for i in range(n):
        mates = [j for j in range(n) if fams[j] == fams[i] and j != i]
        mm_hits.append(np.asarray(mates[:2]))
        mm_evs.append(np.asarray([1e-30, 1e-20]))
    # kNN "alignment" E-values aligned with each hits row (rank-increasing)
    knn_evs = [np.arange(12, dtype=np.float64) * 1e-3 + 1e-8 for _ in range(n)]
    lengths = rng.randint(50, 1200, n)
    metrics = pfam_proteins.run(
        npy, ids, p2d, index_mode="flat", k=12,
        mmseqs_results={"hits": mm_hits, "e_values": mm_evs},
        knn_e_values=knn_evs,
        figures_dir=tmp_path / "figs",
        sequence_lengths=lengths,
    )
    assert metrics["auc1"] > 0.9
    assert metrics["merged_auc1"] >= metrics["auc1"] - 0.05
    assert (tmp_path / "figs" / "cosine_bucketed_accuracy-data.npz").exists()
    assert (tmp_path / "figs" / "accuracy_over_hits-data.npz").exists()
    # the rendered full-protein endfig families (VERDICT r1 #5)
    for fam in [
        "cosine_bucketed_accuracy",
        "accuracy_over_hits",
        "auc1",
        "precision_recall_curve",
        "protein_length_vs_auc1",
        "length_bucketed_auc1",
    ]:
        for suffix in (".svg", ".jpg", ".eps", ".npz"):
            assert (tmp_path / "figs" / f"{fam}{suffix}").exists(), fam + suffix


def test_merged_coverage_curve():
    from knn_for_homology_tpu.eval.analysis import merged_coverage_curve

    evs = np.asarray([1e-30, 1e-5, 5.0, 100.0])
    knn = np.asarray([0.9, 0.8, 0.95, 0.2])
    mm_ok = np.asarray([1, 1, 0, 0], bool)
    knn_ok = np.asarray([0, 0, 1, 0], bool)
    x, y = merged_coverage_curve(evs, knn, mm_ok, knn_ok, e_cutoff=0.01)
    # order: log(1e-30), log(1e-5) (mmseqs), then -0.95, -0.2 (knn)
    # correctness along that order: 1, 1, 1, 0 → final fraction 3/5
    assert len(y) == 4
    assert abs(y[-1] - 3 / 5) < 1e-12
    assert np.all(np.diff(y) >= 0)


def test_slices_mmseqs_baseline_with_fake(tmp_path, monkeypatch):
    from knn_for_homology_tpu.pipelines.slices_pipeline import (
        mmseqs_slice_baseline,
    )

    _install_fake_mmseqs(tmp_path, monkeypatch)
    slices = tmp_path / "slices.fasta"
    slices.write_text(">P1-0\nACDEFGHIKL\n>P1-400\nMKTAYIAKQR\n")
    full = tmp_path / "full.fasta"
    full.write_text(">P1\nACDEFGHIKLMKTAYIAKQR\n>P2\nWWWWYYYYHH\n")
    out = mmseqs_slice_baseline(slices, full, tmp_path / "work")
    assert out["search_seconds"] >= 0
    assert out["n_queries_with_hits"] == 2
    assert set(out["hits"]) == {0, 1}


def test_cath_search_cli(tmp_path):
    rng = np.random.RandomState(10)
    np.save(tmp_path / "M.npy", rng.randn(30, 8).astype(np.float32))
    cath.main(["--data", str(tmp_path), "--hits", "4"])
    assert (tmp_path / "hits_cosine.npz").exists()
    assert (tmp_path / "hits_euclidean.npz").exists()


def test_proteins_search_cli(tmp_path):
    from knn_for_homology_tpu.pipelines.pfam_proteins import main as ps_main

    rng = np.random.RandomState(11)
    np.save(tmp_path / "full_sequences.npy", rng.randn(120, 16).astype(np.float16))
    ps_main(["flat", "--data", str(tmp_path), "--k", "20"])
    hits = np.load(tmp_path / "full_sequences_flat_hits.npy")
    assert hits.shape == (120, 20)
    assert (tmp_path / "full_sequences_flat.index").exists()
    # rerun reuses the persisted index
    ps_main(["flat", "--data", str(tmp_path), "--k", "20"])
