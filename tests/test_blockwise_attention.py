"""Blockwise (flash-style) attention must equal dense attention — the
capability that removes the reference's 3096-aa truncation ceiling
(reference: pfam/embed_t5_fp16.py:29-35)."""

import numpy as np
import pytest

import jax.numpy as jnp

from knn_for_homology_tpu.models import t5


def make_cfg(**kw):
    base = dict(
        vocab_size=32, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4
    )
    base.update(kw)
    return t5.T5Config(**base)


def test_blockwise_equals_dense():
    dense_cfg = make_cfg(blockwise_above=10**9, dtype=jnp.float32)
    block_cfg = make_cfg(
        blockwise_above=1, attention_chunk=16, dtype=jnp.float32
    )
    params = t5.init_params(dense_cfg, seed=0)
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 24, size=(3, 50)).astype(np.int32)
    mask = np.ones((3, 50), dtype=bool)
    mask[0, 37:] = False
    mask[2, 45:] = False
    dense = t5.encode(params, jnp.asarray(ids), jnp.asarray(mask), dense_cfg)
    block = t5.encode(params, jnp.asarray(ids), jnp.asarray(mask), block_cfg)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(block), atol=2e-4, rtol=2e-4
    )


def test_blockwise_handles_beyond_ceiling_lengths():
    """A sequence longer than the reference's hard cutoff embeds fine."""
    cfg = make_cfg(blockwise_above=256, attention_chunk=128, dtype=jnp.float32)
    params = t5.init_params(cfg, seed=1)
    rng = np.random.RandomState(1)
    long_len = 4096  # > 3096, impossible in the reference without truncation
    ids = rng.randint(3, 24, size=(1, long_len)).astype(np.int32)
    mask = np.ones((1, long_len), dtype=bool)
    out = t5.encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    assert out.shape == (1, long_len, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_blockwise_respects_padding():
    cfg = make_cfg(blockwise_above=1, attention_chunk=8, dtype=jnp.float32)
    params = t5.init_params(cfg, seed=2)
    rng = np.random.RandomState(2)
    ids = rng.randint(3, 24, size=(1, 24)).astype(np.int32)
    short = ids[:, :17]
    mask_full = np.zeros((1, 24), dtype=bool)
    mask_full[0, :17] = True
    out_padded = t5.encode(
        params, jnp.asarray(ids * mask_full), jnp.asarray(mask_full), cfg
    )
    out_short = t5.encode(
        params,
        jnp.asarray(short),
        jnp.asarray(np.ones((1, 17), dtype=bool)),
        cfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_padded)[0, :17],
        np.asarray(out_short)[0],
        atol=2e-4,
        rtol=2e-4,
    )


def test_flash_kernel_path_equals_dense():
    """encode() with use_flash_kernel must match dense attention."""
    dense_cfg = make_cfg(blockwise_above=10**9, dtype=jnp.float32)
    flash_cfg = make_cfg(
        blockwise_above=1, attention_chunk=16, use_flash_kernel=True,
        dtype=jnp.float32,
    )
    params = t5.init_params(dense_cfg, seed=3)
    rng = np.random.RandomState(3)
    ids = rng.randint(3, 24, size=(2, 40)).astype(np.int32)
    mask = np.ones((2, 40), dtype=bool)
    mask[1, 29:] = False
    dense = t5.encode(params, jnp.asarray(ids), jnp.asarray(mask), dense_cfg)
    flash = t5.encode(params, jnp.asarray(ids), jnp.asarray(mask), flash_cfg)
    # compare real rows only (padded rows are ignored downstream)
    for b in range(2):
        rows = mask[b]
        np.testing.assert_allclose(
            np.asarray(dense)[b, rows],
            np.asarray(flash)[b, rows],
            atol=3e-4,
            rtol=3e-4,
        )
