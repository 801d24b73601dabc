"""ctypes bindings for the C++ MMseqs2-format IO (built on demand).

`load()` compiles libmmseqs_io.so with the in-tree Makefile the first time
(g++ is available in the image) and caches the handle; every entry point
returns None/False when the native library is unavailable so callers fall
back to the pure-Python implementations in interop/mmseqs_format.py.
"""

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libmmseqs_io.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_DIR, check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.rr_open.restype = ctypes.c_void_p
    lib.rr_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rr_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.rr_close.argtypes = [ctypes.c_void_p]
    lib.pf_write.restype = ctypes.c_int
    lib.pf_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    _LIB = lib
    return _LIB


def read_result_records_native(result_db: Path, e_value_column: int):
    """→ (qids [N], [target arrays], [evalue arrays]) or None."""
    lib = load()
    if lib is None:
        return None
    from ..mmseqs_format import _result_data_files

    data_files = "\n".join(str(f) for f in _result_data_files(result_db))
    nq = ctypes.c_int64()
    ne = ctypes.c_int64()
    handle = lib.rr_open(
        (str(result_db) + ".index").encode(),
        data_files.encode(),
        e_value_column,
        ctypes.byref(nq),
        ctypes.byref(ne),
    )
    if not handle:
        return None
    qids = np.zeros(nq.value, dtype=np.int64)
    counts = np.zeros(nq.value, dtype=np.int64)
    targets = np.zeros(ne.value, dtype=np.int64)
    evalues = np.zeros(ne.value, dtype=np.float64)
    lib.rr_fill(
        handle,
        qids.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        targets.ctypes.data_as(ctypes.c_void_p),
        evalues.ctypes.data_as(ctypes.c_void_p),
    )
    lib.rr_close(handle)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    t_list = [targets[bounds[i] : bounds[i + 1]] for i in range(nq.value)]
    e_list = [evalues[bounds[i] : bounds[i + 1]] for i in range(nq.value)]
    return qids, t_list, e_list


def write_prefilter_native(
    prefilter_db: Path,
    hits: np.ndarray,
    queries: np.ndarray,
    scores_x100: np.ndarray,
    test_to_mmseqs: np.ndarray,
    train_to_mmseqs: np.ndarray,
) -> bool:
    lib = load()
    if lib is None:
        return False
    hits = np.asarray(hits, dtype=np.int64)
    translated = np.where(
        hits >= 0,
        np.asarray(train_to_mmseqs)[np.clip(hits, 0, None)],
        -1,
    ).astype(np.int64)
    qids = np.ascontiguousarray(
        np.asarray(test_to_mmseqs)[np.asarray(queries)], dtype=np.int64
    )
    translated = np.ascontiguousarray(translated)
    scores = np.ascontiguousarray(scores_x100, dtype=np.float64)
    rc = lib.pf_write(
        (str(prefilter_db) + ".0").encode(),
        (str(prefilter_db) + ".index").encode(),
        qids.ctypes.data_as(ctypes.c_void_p),
        len(qids),
        translated.ctypes.data_as(ctypes.c_void_p),
        scores.ctypes.data_as(ctypes.c_void_p),
        translated.shape[1],
    )
    return rc == 0
