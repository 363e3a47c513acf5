"""Weight-only int8 quantization tests (quant.py + Streamer weights="int8")."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.quant import (
    dequantize_params,
    quantization_error,
    quantize_params,
)
from cleanumamba_tpu.streaming import Streamer

TINY = dict(
    channels_H=8,
    max_H=16,
    encoder_n_layers=4,
    tsfm_n_layers=2,
    tsfm_n_head=2,
    tsfm_d_model=16,
    tsfm_d_inner=32,
    normalize_input=False,
)


def test_quantize_roundtrip_error_bounded():
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, min_size=64)
    # every quantized leaf reconstructs within the symmetric-int8 bound:
    # |w - dq| <= scale/2 per channel, i.e. <= max|w| / 254 per tensor
    assert quantization_error(params, qp) <= 1.0 / 254 + 1e-6
    # structure preserved
    dq = dequantize_params(qp, jnp.float32)
    assert jax.tree_util.tree_structure(dq) == jax.tree_util.tree_structure(params)


def test_sensitive_leaves_never_quantized():
    """A_log and friends stay fp32 at any size: their consumers
    exponentiate, so int8 log-space rounding error would amplify."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, min_size=1)
    for lp in qp["bottleneck"]["layers"]:
        a = lp["mixer"]["A_log"]
        assert hasattr(a, "dtype") and a.dtype == jnp.float32


def test_small_leaves_left_dense():
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, min_size=10**9)  # nothing big enough
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(qp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_int8_streamer_tracks_fp32():
    """Streamer(weights="int8") output stays close to the fp32 streamer on
    the same audio (weight-only quantization, per-channel scales)."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(1, 4096)) * 0.2).astype(np.float32)

    s32 = Streamer(params, cfg)
    # min_size=64 so the tiny model's weights actually quantize
    s8 = Streamer(params, cfg, weights="int8", quant_min_size=64)
    from cleanumamba_tpu.quant import _Q_TAG

    def count_q(t):
        n = 0
        def rec(x):
            nonlocal n
            if isinstance(x, dict):
                if _Q_TAG in x:
                    n += 1
                else:
                    for v in x.values(): rec(v)
            elif isinstance(x, (list, tuple)):
                for v in x: rec(v)
        rec(t)
        return n
    assert count_q(s8.params) >= 10, "tiny model did not actually quantize"
    y32 = np.concatenate([s32.feed(audio), s32.flush()], axis=1)
    y8 = np.concatenate([s8.feed(audio), s8.flush()], axis=1)
    assert y32.shape == y8.shape
    denom = np.abs(y32).max() + 1e-12
    rel = np.abs(y32 - y8).max() / denom
    assert rel < 0.05, rel
    # and the quantized model still resembles the offline fp32 forward
    y_off = np.asarray(forward(params, jnp.asarray(audio), cfg))
    assert np.isfinite(y8).all() and y_off.shape[1] >= y8.shape[1]
