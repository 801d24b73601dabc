"""The Pallas SW kernel must be BIT-identical to the XLA grouped kernel
(they share the DP formulation; only residency differs)."""

import jax
import numpy as np
import pytest

from knn_for_homology_tpu.ops.align import (
    encode_sequence,
    sw_scores,
    sw_scores_grouped,
)
from knn_for_homology_tpu.ops.align_pallas import (
    MAX_LT_K,
    MAX_LT_K_HBM,
    sw_scores_grouped_pallas,
)


def _workload(seed=5, g=3, k=128, lq=96, lt=160):
    rng = np.random.RandomState(seed)
    aas = "ACDEFGHIKLMNPQRSTVWYX"
    qs = ["".join(rng.choice(list(aas), rng.randint(10, lq)))
          for _ in range(g)]
    ts = [["".join(rng.choice(list(aas), rng.randint(5, lt)))
           for _ in range(k)] for _ in range(g)]
    q_codes = np.stack([encode_sequence(q, lq) for q in qs])
    t_codes = np.stack(
        [np.stack([encode_sequence(t, lt) for t in row]) for row in ts]
    )
    return q_codes, t_codes


@pytest.mark.parametrize("convention", ["blast", "mmseqs"])
def test_pallas_matches_grouped_kernel(convention):
    q_codes, t_codes = _workload()
    got = np.asarray(
        sw_scores_grouped_pallas(q_codes, t_codes, convention=convention)
    )
    want = np.asarray(
        sw_scores_grouped(q_codes, t_codes, convention=convention)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_matches_pair_kernel_per_pair():
    q_codes, t_codes = _workload(seed=9, g=2, k=128, lq=64, lt=96)
    got = np.asarray(sw_scores_grouped_pallas(q_codes, t_codes))
    flat_q = np.repeat(q_codes, t_codes.shape[1], axis=0)
    flat_t = t_codes.reshape(-1, t_codes.shape[2])
    want = np.asarray(sw_scores(flat_q, flat_t)).reshape(got.shape)
    np.testing.assert_array_equal(got, want)


def test_pallas_shape_guards():
    q = np.zeros((2, 64), np.int32)
    with pytest.raises(ValueError, match="multiple of 128"):
        sw_scores_grouped_pallas(q, np.zeros((2, 64, 128), np.int32))
    big_lt = MAX_LT_K_HBM // 128 + 128
    with pytest.raises(ValueError, match="VMEM budget"):
        sw_scores_grouped_pallas(
            q, np.zeros((2, 128, big_lt), np.int32)
        )


def test_long_target_interpret_matches_grouped_kernel():
    # Lt*K above MAX_LT_K: on TPU this takes the HBM-profile DMA kernel;
    # in interpret it stays on the resident kernel — either way scores
    # must equal the XLA oracle
    q_codes, t_codes = _workload(seed=13, g=2, k=128, lq=48, lt=640)
    assert t_codes.shape[1] * t_codes.shape[2] > MAX_LT_K
    got = np.asarray(sw_scores_grouped_pallas(q_codes, t_codes))
    want = np.asarray(sw_scores_grouped(q_codes, t_codes))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Mosaic kernel needs real TPU (interpret covers CI)",
)
def test_pallas_compiled_matches_interpret():
    q_codes, t_codes = _workload(seed=11)
    got = np.asarray(
        sw_scores_grouped_pallas(q_codes, t_codes, interpret=False)
    )
    want = np.asarray(
        sw_scores_grouped_pallas(q_codes, t_codes, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="the HBM-profile DMA kernel only exists compiled (interpret"
    " routes to the resident kernel)",
)
def test_hbm_kernel_compiled_matches_interpret():
    q_codes, t_codes = _workload(seed=17, g=2, k=128, lq=48, lt=640)
    assert t_codes.shape[1] * t_codes.shape[2] > MAX_LT_K
    got = np.asarray(
        sw_scores_grouped_pallas(q_codes, t_codes, interpret=False)
    )
    want = np.asarray(
        sw_scores_grouped_pallas(q_codes, t_codes, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def _ragged_workload(seed=23, g=3, k=128, lq=96, lt=192, s_max=4,
                     seg_lo=5, seg_hi=60):
    """Ragged lanes: up to s_max targets per lane, -1 separators; returns
    (q_codes, t_ragged, ref) with ref = list of (g, s, k, codes)."""
    rng = np.random.RandomState(seed)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    qs = ["".join(rng.choice(list(aas), rng.randint(20, lq)))
          for _ in range(g)]
    q_codes = np.stack([encode_sequence(q, lq) for q in qs])
    t_ragged = np.full((g, k, lt), -1, np.int32)
    ref = []
    for gi in range(g):
        for ki in range(k):
            pos, si = 0, 0
            while si < s_max:
                tl = int(rng.randint(seg_lo, seg_hi))
                if pos + tl > lt:
                    break
                t = "".join(rng.choice(list(aas), tl))
                t_ragged[gi, ki, pos : pos + tl] = encode_sequence(t, tl)
                ref.append((gi, si, ki, t))
                pos += tl + 1
                si += 1
    return qs, q_codes, t_ragged, ref


def test_segmented_pallas_matches_single_lane_kernel():
    """Ragged lanes (multiple -1-separated targets per lane) must score
    every segment bit-identically to the unsegmented kernel scoring each
    target in its own lane — the segmented prefix max cannot leak
    alignments (or gap extensions) across segment boundaries."""
    qs, q_codes, t_ragged, ref = _ragged_workload()
    out = np.asarray(sw_scores_grouped_pallas(
        q_codes, t_ragged, convention="mmseqs", segments=4, max_seg_len=64
    ))
    assert out.shape == (3, 4, 128)
    # golden: per (g): each target alone in a lane
    by_g = {}
    for gi, si, ki, t in ref:
        by_g.setdefault(gi, []).append((si, ki, t))
    for gi, entries in by_g.items():
        for start in range(0, len(entries), 128):
            chunk = entries[start : start + 128]
            lt_max = max(len(t) for _, _, t in chunk)
            tc = np.full((1, 128, lt_max), -1, np.int32)
            for i, (_, _, t) in enumerate(chunk):
                tc[0, i, : len(t)] = encode_sequence(t, len(t))
            gold = np.asarray(sw_scores_grouped(
                q_codes[gi : gi + 1], tc, convention="mmseqs"
            ))[0]
            for i, (si, ki, _) in enumerate(chunk):
                assert out[gi, si, ki] == gold[i], (gi, si, ki)


def test_segmented_sweep_bound_exact():
    """max_seg_len bounds the prefix-max sweeps; any bound >= the longest
    segment must give identical scores."""
    _, q_codes, t_ragged, _ = _ragged_workload(seed=29, lt=256)
    a = np.asarray(sw_scores_grouped_pallas(
        q_codes, t_ragged, segments=4, max_seg_len=64
    ))
    b = np.asarray(sw_scores_grouped_pallas(
        q_codes, t_ragged, segments=4
    ))
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled segmented kernel needs the TPU backend",
)
def test_segmented_compiled_matches_interpret():
    _, q_codes, t_ragged, _ = _ragged_workload(seed=31)
    got = np.asarray(sw_scores_grouped_pallas(
        q_codes, t_ragged, segments=4, max_seg_len=64, interpret=False
    ))
    want = np.asarray(sw_scores_grouped_pallas(
        q_codes, t_ragged, segments=4, max_seg_len=64, interpret=True
    ))
    np.testing.assert_array_equal(got, want)
