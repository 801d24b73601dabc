"""Fused short-sequence attention kernel vs the dense reference, plus the
encode()-level routing that selects it."""

import numpy as np

import jax
import jax.numpy as jnp

from knn_for_homology_tpu.models import t5
from knn_for_homology_tpu.models.t5 import T5Config, position_bias
from knn_for_homology_tpu.ops.short_attention import short_attention_t5

from test_flash_attention import dense_reference, make_inputs


def test_short_matches_dense():
    config = T5Config(num_heads=4, d_kv=16)
    q, k, v, mask, rel = make_inputs()
    want = np.asarray(dense_reference(q, k, v, mask, rel, config))
    bias = position_bias(rel, q.shape[2], k.shape[2], config)[0]
    got = np.asarray(short_attention_t5(q, k, v, mask, bias))
    m = np.asarray(mask)
    for bi in range(2):
        np.testing.assert_allclose(
            got[bi, :, m[bi]], want[bi, :, m[bi]], atol=2e-4, rtol=2e-4
        )


def test_short_all_masked_row_is_finite():
    """An all-masked batch row must softmax to uniform (dense-path -1e9
    semantics), never NaN — padded rows exist in every token-budget batch."""
    config = T5Config(num_heads=2, d_kv=8)
    rng = np.random.RandomState(3)
    b, h, l, dk = 2, 2, 64, 8
    q = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    mask = np.ones((b, l), dtype=bool)
    mask[1, :] = False
    bias = position_bias(
        jnp.asarray(rng.randn(32, h).astype(np.float32)), l, l, config
    )[0]
    out = np.asarray(short_attention_t5(q, q, q, jnp.asarray(mask), bias))
    assert np.isfinite(out).all()


def test_encode_short_kernel_matches_dense_path():
    """encode() with use_short_kernel forced on must reproduce the dense
    XLA path (same fp32 scores / bf16 probs / fp32 PV numerics). fp32
    config: in bf16 the two paths differ by one ulp on CPU interpret mode
    (they are bit-identical on real TPU, measured 2026-08-17)."""
    config = t5.T5Config(**{**t5.TINY.__dict__, "dtype": jnp.float32})
    params = t5.init_params(config, seed=0)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, 30, (3, 50)).astype(np.int32))
    mask = np.ones((3, 50), dtype=bool)
    mask[2, 31:] = False
    mask = jnp.asarray(mask)
    dense_cfg = t5.T5Config(
        **{**config.__dict__, "use_short_kernel": False}
    )
    short_cfg = t5.T5Config(
        **{**config.__dict__, "use_short_kernel": True}
    )
    want = np.asarray(t5.encode(params, ids, mask, dense_cfg))
    got = np.asarray(t5.encode(params, ids, mask, short_cfg))
    m = np.asarray(mask)
    for bi in range(3):
        np.testing.assert_allclose(
            got[bi, m[bi]], want[bi, m[bi]], atol=2e-4, rtol=2e-4
        )


def test_short_head_grouping_matches_ungrouped(monkeypatch):
    """Shrinking the VMEM budget forces the (head_groups, B) grid split;
    results must match the single-group path exactly."""
    from knn_for_homology_tpu.ops import short_attention as sa

    config = T5Config(num_heads=8, d_kv=32)
    rng = np.random.RandomState(5)
    b, h, l, dk = 3, 8, 96, 32  # distinct shape: avoids the jit cache
    q = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    mask = np.ones((b, l), dtype=bool)
    mask[1, 70:] = False
    mask = jnp.asarray(mask)
    rel = jnp.asarray(rng.randn(32, h).astype(np.float32) * 0.5)
    bias = position_bias(rel, l, l, config)[0]
    want = np.asarray(short_attention_t5(q, k, v, mask, bias))
    monkeypatch.setattr(sa, "VMEM_BUDGET", 1)  # force hg=1 (8 groups)
    sa.short_attention_t5.clear_cache()
    got = np.asarray(sa.short_attention_t5(q, k, v, mask, bias))
    sa.short_attention_t5.clear_cache()
    np.testing.assert_array_equal(got, want)
