#!/usr/bin/env python3
"""A format-faithful fake `mmseqs` binary for integration-testing the
subprocess bridge (interop/mmseqs_cli.py) without the real tool.

Supports the three subcommands the pipelines call:
  createdb <fasta> <db>                   — via the native sequence-DB writer
  align -e E <qdb> <tdb> <prefilter> <out>— echoes the prefilter's hits as an
                                            alignment result DB (10 columns),
                                            E-values derived from the stored
                                            prefilter scores (rank-preserving)
  search -e E -s S <qdb> <tdb> <out> <tmp>— every query "hits" the first 3
                                            targets (deterministic dummy)

Result DBs follow the real layout: numbered data files, NUL-terminated
records, tab-separated columns, .index of (query id, offset, length),
.dbtype 5 (alignment result).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from knn_for_homology_tpu.data.fasta import iter_fasta  # noqa: E402
from knn_for_homology_tpu.interop.mmseqs_format import (  # noqa: E402
    read_result_records,
    write_sequence_db,
)


def write_result_db(records, out_db: Path) -> None:
    """records: list of (query_mmseqs_id, [(target_id, e_value), ...])."""
    out_db = Path(out_db)
    with open(str(out_db) + ".0", "wb") as data, open(
        str(out_db) + ".index", "w"
    ) as index:
        offset = 0
        for qid, rows in records:
            chunk = b"".join(
                f"{t}\t100\t0.9\t{ev:.3E}\t0\t10\t20\t0\t10\t20\n".encode()
                for t, ev in rows
            ) + b"\0"
            data.write(chunk)
            index.write(f"{qid}\t{offset}\t{len(chunk)}\n")
            offset += len(chunk)
    Path(str(out_db) + ".dbtype").write_bytes(b"\x05\x00\x00\x00")


def n_entries(db: Path) -> int:
    with open(str(db) + ".index") as fp:
        return sum(1 for _ in fp)


def cmd_createdb(args):
    fasta, db = Path(args[0]), Path(args[1])
    write_sequence_db(iter_fasta(fasta), db)


def cmd_align(args):
    # align -e E qdb tdb prefilter out
    assert args[0] == "-e"
    qdb, tdb, prefilter, out = args[2:6]
    qids, targets, _ = read_result_records(Path(prefilter), e_value_column=3)
    # prefilter data column 1 holds score*100; recover rank-preserving
    # E-values: higher score → lower E
    _, _, scores = read_result_records(Path(prefilter), e_value_column=1)
    records = []
    for qid, t_arr, s_arr in zip(qids, targets, scores):
        rows = [
            (int(t), float(10.0 ** (-s / 100.0)))
            for t, s in zip(t_arr, s_arr)
        ]
        rows.sort(key=lambda r: r[1])
        records.append((int(qid), rows))
    write_result_db(records, Path(out))


def cmd_search(args):
    # search -e E -s S qdb tdb out tmp  (flags may include --max-seqs etc.)
    vals = []
    skip = False
    for i, a in enumerate(args):
        if skip:
            skip = False
            continue
        if a.startswith("-"):
            skip = True
            continue
        vals.append(a)
    qdb, tdb, out, _tmp = vals[:4]
    n_q = n_entries(Path(qdb))
    n_t = n_entries(Path(tdb))
    records = []
    for qid in range(n_q):
        rows = [(t, 10.0 ** (-(3 - j)) ) for j, t in enumerate(range(min(3, n_t)))]
        records.append((qid, rows))
    write_result_db(records, Path(out))


def main():
    command = sys.argv[1]
    args = sys.argv[2:]
    if command == "createdb":
        cmd_createdb(args)
    elif command == "align":
        cmd_align(args)
    elif command == "search":
        cmd_search(args)
    else:
        raise SystemExit(f"fake mmseqs: unsupported subcommand {command}")


if __name__ == "__main__":
    main()
