"""Quickstart: the whole pipeline on a generated dataset, end to end.

    python examples/quickstart.py [workdir]

Builds a deterministic clustered dataset, embeds its sequences with the
AA-composition baseline (no checkpoints needed), runs exact + LSH + graph
search, rescored hybrid alignment, evaluation, and a sharded search over
however many devices are visible.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from knn_for_homology_tpu.data import Dataset
from knn_for_homology_tpu.data.fixtures import make_clustered
from knn_for_homology_tpu.eval import evaluate_rows, evaluate_string_results
from knn_for_homology_tpu.models import AACompositionEmbedder
from knn_for_homology_tpu.parallel import ShardedFlatIndex, make_pod_mesh
from knn_for_homology_tpu.search import FlatIndex, GraphIndex, LSHIndex, knn_search
from knn_for_homology_tpu.search.rescore import align_rescore


def main() -> None:
    workdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    data_dir = workdir / "demo-dataset"
    print(f"1. building a clustered demo dataset in {data_dir}")
    make_clustered(data_dir, n_families=10, n_train=8, n_test=4, dim=48)
    ds = Dataset.from_dir(data_dir, hits=8)

    print("2. embedding the fasta sequences (AA-composition baseline)")
    from knn_for_homology_tpu.data.fasta import read_fasta

    train_seqs = read_fasta(ds.train_sequences)
    test_seqs = read_fasta(ds.test_sequences)
    # the generated npys are already informative; here we additionally show
    # the sequence → vector path the pLM encoders share
    embedder = AACompositionEmbedder()
    _ = embedder.embed_pooled([train_seqs[i] for i in ds.train_ids])

    print("3. exact flat search (fused top-k)")
    ids, scores, seconds = knn_search(ds.load_train(), ds.load_test(), ds.hits)
    auc1s, tps = evaluate_rows(ds, ids)
    print(f"   exact: AUC1 {np.mean(auc1s):.3f}  TP {np.mean(tps):.3f}  {seconds:.2f}s")

    print("4. approximate indexes")
    from knn_for_homology_tpu.search import IVFIndex

    # lean layout: int8 cluster slabs only (~n*(d+12) bytes on device);
    # bound explicitly — it also anchors the persistence round-trip below
    lean = IVFIndex(metric="cosine", nprobe=8, store_fp32=False).add(
        ds.load_train()
    )
    for name, index in [
        ("lsh", LSHIndex(dim=48, nbits=256).add(ds.load_train())),
        ("graph", GraphIndex(metric="cosine", degree=12, beam_width=48).add(ds.load_train())),
        ("ivf", IVFIndex(metric="cosine", nprobe=8).add(ds.load_train())),
        ("ivf-lean", lean),
    ]:
        _, a_ids = index.search(ds.load_test(), ds.hits)
        a_auc1s, _ = evaluate_rows(ds, a_ids)
        print(f"   {name}: AUC1 {np.mean(a_auc1s):.3f}")

    print("   index persistence round-trip (npz)")
    from knn_for_homology_tpu.search.io import read_index, write_index

    _, lean_ids = lean.search(ds.load_test(), ds.hits)
    write_index(lean, workdir / "ivf-lean.npz")
    reloaded = read_index(workdir / "ivf-lean.npz")
    _, r_ids = reloaded.search(ds.load_test(), ds.hits)
    assert np.array_equal(np.asarray(r_ids), np.asarray(lean_ids))
    print("   reloaded ivf-lean matches in-memory ✓")

    print("5. hybrid: on-device Smith-Waterman rescoring of the kNN hits")
    hits, e_values, align_seconds = align_rescore(ds, ids)
    h_auc1s, h_tps = evaluate_string_results(ds, hits.items())
    print(
        f"   hybrid: AUC1 {np.mean(h_auc1s):.3f}  TP {np.mean(h_tps):.3f}"
        f"  {align_seconds:.2f}s"
    )

    print("6. sharded search over all visible devices")
    mesh = make_pod_mesh()
    sharded = ShardedFlatIndex(mesh, metric="cosine").add(ds.load_train())
    s_scores, s_ids = sharded.search(ds.load_test(), ds.hits)
    assert np.array_equal(s_ids, ids), "sharded must equal single-device"
    print(f"   {mesh.devices.size}-device sharded search matches single-device ✓")


if __name__ == "__main__":
    main()
