"""Index persistence — FAISS write_index/read_index parity
(reference: seqvec_search/create_index.py:47, pfam/proteins_search.py:39-40;
search drivers skip rebuild when the index file exists,
pfam/search.py:32-34).

Format: a single .npz with a "kind" tag; compact (LSH sketches stay
bit-packed, flat vectors stored in their storage dtype).
"""

from pathlib import Path

import numpy as np


def write_index(index, path: Path) -> None:
    state = index.state()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **state)
    if path.suffix != ".npz":  # numpy appends .npz; keep the exact name
        Path(str(path) + ".npz").replace(path)


def read_index(path: Path):
    with np.load(path, allow_pickle=False) as data:
        state = {key: data[key] for key in data.files}
    kind = str(state["kind"])
    if kind == "lsh":
        from .lsh import LSHIndex

        return LSHIndex.from_state(state)
    if kind == "flat":
        from .flat import FlatIndex

        return FlatIndex.from_state(state)
    if kind == "graph":
        from .graph import GraphIndex

        return GraphIndex.from_state(state)
    if kind == "ivf":
        from .ivf import IVFIndex

        return IVFIndex.from_state(state)
    raise ValueError(f"unknown index kind {kind!r}")
