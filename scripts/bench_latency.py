#!/usr/bin/env python3
"""Single-query / small-batch serving latency (VERDICT r4 #5/#6).

The batch-throughput campaigns measure 4096-query blocks; the
reference's CLI use case (seqvec_search/main.py:114-198 — one dataset's
queries, one-off lookups) is latency-shaped. This measures end-to-end
wall latency per search() call (numpy in → numpy out) for the flat,
IVF and graph engines at batch ∈ {1, 16, 64}.

On this machine every call crosses the axon relay, which charges
~60-100 ms per host round-trip regardless of device work; the
`relay_floor` case measures that floor directly (a scalar device fetch)
so device-side latency ≈ p50 − relay_floor. On-prem TPU serving pays
PCIe (~µs) instead of the relay. One JSON line per case.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def time_calls(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts


def stats(ts):
    n = len(ts)
    return {
        "p50_ms": round(ts[n // 2] * 1e3, 1),
        "p99_ms": round(ts[min(n - 1, int(n * 0.99))] * 1e3, 1),
        "min_ms": round(ts[0] * 1e3, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-n", type=int, default=17)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 16, 64])
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--skip-graph", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (smoke-testing)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from bench_ivf import make_clustered_chunks
    from knn_for_homology_tpu.search.flat import FlatIndex
    from knn_for_homology_tpu.search.graph import GraphIndex
    from knn_for_homology_tpu.search.ivf import IVFIndex
    from knn_for_homology_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    n = 1 << args.log_n
    # db generated ON DEVICE (the relay tunnel is ~3 MB/s), CLUSTERED
    # like real embedding corpora (a pure-Gaussian d=1024 db has no cell
    # structure, so IVF recall collapses to ~nprobe/cells — the r5
    # latency run's 0.16 "recall" measured the generator, not the index)
    chunks = make_clustered_chunks(
        jax.random.PRNGKey(0), n, args.d, max(1, n // 128), n
    )
    db = next(iter(chunks()))
    jax.block_until_ready(db)
    qpool = np.asarray(db[: max(args.batches) * args.reps])

    # relay floor: a scalar fetch with trivial device work
    one = jnp.float32(0)
    floor = stats(time_calls(lambda: float(one + 1), args.reps))
    print(json.dumps({"case": "relay_floor", **floor}), flush=True)

    engines = {}
    t0 = time.time()
    engines["flat-sq8"] = FlatIndex(backend="sq8").add(db)
    print(json.dumps(
        {"case": "build", "engine": "flat-sq8",
         "seconds": round(time.time() - t0, 1)}), flush=True)
    t0 = time.time()
    engines["ivf"] = IVFIndex(nprobe=args.nprobe).add(db)
    print(json.dumps(
        {"case": "build", "engine": "ivf",
         "seconds": round(time.time() - t0, 1)}), flush=True)
    if not args.skip_graph:
        t0 = time.time()
        engines["graph"] = GraphIndex().add(db)
        print(json.dumps(
            {"case": "build", "engine": "graph",
             "seconds": round(time.time() - t0, 1)}), flush=True)

    # exact ids on the largest batch for a recall column
    ref_ids = None
    exact = FlatIndex(backend="auto").add(db)
    for name, idx in engines.items():
        for b in args.batches:
            qs = [qpool[i * b : (i + 1) * b] for i in range(args.reps)]
            if ref_ids is None or ref_ids.shape[0] != b * args.reps:
                _, ref_ids = exact.search(qpool[: b * args.reps], args.k)
            idx.search(qs[0], args.k)  # compile outside the timed reps
            out = []
            i_box = {"i": 0}

            def call():
                q = qs[i_box["i"] % args.reps]
                i_box["i"] += 1
                out.append(idx.search(q, args.k)[1])

            ts = time_calls(call, args.reps)
            got = np.concatenate(out, axis=0)[: b * args.reps]
            rec = float(np.mean([
                len(np.intersect1d(got[i], ref_ids[i])) / args.k
                for i in range(got.shape[0])
            ]))
            print(json.dumps({
                "case": "latency", "engine": name, "batch": b,
                "n": n, "k": args.k, **stats(ts),
                "recall": round(rec, 4),
                "qps_at_p50": round(b / (stats(ts)["p50_ms"] / 1e3), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
