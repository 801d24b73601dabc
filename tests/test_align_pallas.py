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
