"""README's performance paragraph must quote the NEWEST driver bench
artifact (VERDICT r4 weak #5: docs pinned BENCH_r03 while r04 existed).
The check is mechanical: find the highest-numbered BENCH_r*.json, format
its headline numbers exactly as the docs quote them, and grep for them.
"""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _latest_artifact():
    arts = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no BENCH_r*.json artifacts at the repo root"
    return arts[-1]


def _parsed(path):
    data = json.loads(path.read_text())
    # driver artifacts wrap the bench JSON line under "parsed"
    return data.get("parsed", data)


def _fmt_k(v: float) -> str:
    return f"{v / 1000:.1f}k"


def test_readme_quotes_latest_artifact():
    art = _latest_artifact()
    readme = (REPO / "README.md").read_text()
    assert art.name in readme, (
        f"README must name the newest artifact {art.name}"
    )
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
    art = _latest_artifact()
    parity = (REPO / "PARITY.md").read_text()
    assert art.name in parity
    stem = art.stem  # e.g. BENCH_r04
    # PARITY quotes per-mode numbers tagged with the artifact stem
    assert f"({stem})" in parity
    stale = set(re.findall(r"BENCH_r(\d+)", parity))
    newest = re.search(r"r(\d+)", art.name).group(1)
    assert stale == {newest}, (
        f"PARITY quotes stale artifacts: {sorted(stale)} (newest {newest})"
    )
