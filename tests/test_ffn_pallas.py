"""Fused FFN kernel parity vs the model's _mlp (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from knn_for_homology_tpu.models.t5 import T5Config, _mlp
from knn_for_homology_tpu.ops.ffn_pallas import fused_ffn_t5


def _case(b, l, d, dff, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    kx, ki, ko, kl = jax.random.split(key, 4)
    x = jax.random.normal(kx, (b, l, d), dtype)
    params = {
        "ln": jax.random.normal(kl, (d,), dtype) * 0.1 + 1.0,
        "wi": jax.random.normal(ki, (d, dff), dtype) * 0.05,
        "wo": jax.random.normal(ko, (dff, d), dtype) * 0.05,
    }
    return x, params


def test_fused_ffn_matches_mlp_fp32():
    x, params = _case(2, 24, 128, 512, jnp.float32)
    cfg = T5Config(d_model=128, d_ff=512)
    want = _mlp(x, params, cfg)
    got = fused_ffn_t5(
        x.reshape(-1, 128), params["ln"], params["wi"], params["wo"],
        eps=cfg.layer_norm_eps, bm=16, bf=128,
    ).reshape(x.shape)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_ffn_matches_mlp_bf16():
    x, params = _case(1, 40, 256, 1024, jnp.bfloat16, seed=3)
    cfg = T5Config(d_model=256, d_ff=1024)
    want = np.asarray(_mlp(x, params, cfg), np.float32)
    got = np.asarray(
        fused_ffn_t5(
            x.reshape(-1, 256), params["ln"], params["wi"], params["wo"],
            eps=cfg.layer_norm_eps, bm=32, bf=256,
        ).reshape(x.shape),
        np.float32,
    )
    # bf16 accumulation-order differences only
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_encode_gated_fused_ffn_matches_dense():
    """The use_fused_ffn=True config path equals the dense einsum path."""
    from knn_for_homology_tpu.models.t5 import TINY, encode, init_params
    import dataclasses

    params = init_params(TINY, seed=1)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 17), 0, 32)
    mask = jnp.arange(17)[None, :] < jnp.asarray([17, 9])[:, None]
    dense_cfg = dataclasses.replace(TINY, use_fused_ffn=False)
    fused_cfg = dataclasses.replace(TINY, use_fused_ffn=True)
    want = np.asarray(encode(params, ids, mask, dense_cfg), np.float32)
    got = np.asarray(encode(params, ids, mask, fused_cfg), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_ffn_pads_ragged_token_count():
    x, params = _case(1, 13, 128, 256, jnp.float32, seed=5)
    cfg = T5Config(d_model=128, d_ff=256)
    want = _mlp(x, params, cfg)
    got = fused_ffn_t5(
        x.reshape(-1, 128), params["ln"], params["wi"], params["wo"],
        eps=cfg.layer_norm_eps, bm=8, bf=128,
    ).reshape(x.shape)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
