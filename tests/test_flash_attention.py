"""Pallas flash attention (in-kernel T5 bias) vs dense reference."""

import numpy as np

import jax
import jax.numpy as jnp

from knn_for_homology_tpu.models.t5 import T5Config, position_bias
from knn_for_homology_tpu.ops.flash_attention import flash_attention_t5


def dense_reference(q, k, v, mask, rel_embedding, config):
    bias = position_bias(rel_embedding, q.shape[2], k.shape[2], config)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
    )
    scores = scores + bias
    scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", probs.astype(q.dtype), v)


def make_inputs(b=2, h=4, l=100, dk=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    mask = np.ones((b, l), dtype=bool)
    mask[0, 83:] = False
    rel = jnp.asarray(rng.randn(32, h).astype(np.float32) * 0.5)
    return q, k, v, jnp.asarray(mask), rel


def test_flash_matches_dense():
    config = T5Config(num_heads=4, d_kv=16)
    q, k, v, mask, rel = make_inputs()
    want = np.asarray(dense_reference(q, k, v, mask, rel, config))
    got = np.asarray(
        flash_attention_t5(q, k, v, mask, rel, block=32)
    )
    # compare only real (unmasked) query rows
    m = np.asarray(mask)
    for bi in range(2):
        np.testing.assert_allclose(
            got[bi, :, m[bi]], want[bi, :, m[bi]], atol=2e-4, rtol=2e-4
        )


def test_flash_uneven_blocks_and_padding():
    config = T5Config(num_heads=2, d_kv=8)
    rng = np.random.RandomState(1)
    b, h, l, dk = 1, 2, 77, 8  # not a multiple of any block size
    q = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    mask = jnp.ones((b, l), dtype=bool)
    rel = jnp.asarray(rng.randn(32, h).astype(np.float32))
    want = np.asarray(dense_reference(q, k, v, mask, rel, config))
    got = np.asarray(
        flash_attention_t5(q, k, v, mask, rel, block=16)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
