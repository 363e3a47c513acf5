"""Sequence parallelism: one waveform's TIME axis sharded over the mesh must
reproduce single-device zero-primed streaming exactly (parallel/sequence.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.parallel.mesh import make_mesh
from cleanumamba_tpu.parallel.sequence import _WARM, sp_stream_denoise
from cleanumamba_tpu.streaming import Streamer

TINY = dict(
    channels_H=8,
    max_H=16,
    encoder_n_layers=4,
    tsfm_n_layers=3,
    tsfm_n_head=2,
    tsfm_d_model=16,
    tsfm_d_inner=32,
    normalize_input=False,
)


def _reference_zero_primed(params, cfg, x, total):
    """Single-device streaming of [zeros(ctx) | x | pad], sliced back to x."""
    ts, fl = cfg.total_stride, cfg.frame_length
    ctx = fl + (_WARM - 1) * ts
    B, L = x.shape
    P = np.concatenate(
        [np.zeros((B, ctx), np.float32),
         np.asarray(x, np.float32),
         np.zeros((B, total - L), np.float32)],
        axis=1,
    )
    s = Streamer(params, cfg, batch=B)
    out = np.concatenate([s.feed(P), s.flush()], axis=1)
    return out[:, ctx : ctx + L]


@pytest.mark.parametrize("n_dev,normalize,bottleneck", [
    (8, False, "mamba"), (4, False, "mamba"), (1, False, "mamba"),
    (8, True, "mamba"), (4, True, "mamba"), (1, True, "mamba"),
    (8, False, "mamba2"), (4, True, "mamba2"),
    (8, False, "mamba_s4"), (4, True, "mamba_s4"),
])
@pytest.mark.slow
def test_sp_denoise_matches_streaming(n_dev, normalize, bottleneck):
    assert jax.device_count() >= n_dev
    mesh = make_mesh(n_dev)
    cfg = CleanUMambaConfig(**{**TINY, "normalize_input": normalize,
                               "bottleneck": bottleneck})
    params = init_params(jax.random.PRNGKey(0), cfg)
    ts, fl = cfg.total_stride, cfg.frame_length
    rng = np.random.default_rng(0)
    L = 97 * ts + 5  # deliberately unaligned
    x = (rng.normal(size=(1, L)) * 0.3).astype(np.float32)

    y_sp = np.asarray(sp_stream_denoise(params, cfg, jnp.asarray(x), mesh))
    assert y_sp.shape == (1, L)

    need = L + (fl - ts)
    unit = n_dev * ts
    total = -(-need // unit) * unit
    y_ref = _reference_zero_primed(params, cfg, x, total)
    np.testing.assert_allclose(y_sp, y_ref, atol=3e-4, rtol=2e-3)


def test_sp_denoise_guards():
    mesh = make_mesh(1)
    cfg2 = CleanUMambaConfig(**{**TINY, "bottleneck": "lstm"})
    params2 = init_params(jax.random.PRNGKey(1), cfg2)
    with pytest.raises(NotImplementedError):
        sp_stream_denoise(params2, cfg2, jnp.zeros((1, 4096)), mesh)


def _sp_total(cfg, L, n_dev):
    """Mirror sp_stream_denoise's padding so the reference matches."""
    K, S, D = cfg.kernel_size, cfg.stride, cfg.encoder_n_layers
    ts, fl = cfg.total_stride, cfg.frame_length
    need = L + (fl - ts)
    unit = n_dev * ts
    total = -(-need // unit) * unit
    pfl = K + S * (S ** (D - 1) - 1)
    ctx_len = fl + (_WARM - 1) * ts + max(0, 2 * ts + pfl - fl)
    min_per_dev = max(-(-ctx_len // ts) * ts, _WARM * ts)
    if total // n_dev < min_per_dev:
        total = n_dev * min_per_dev
    return total


@pytest.mark.slow
def test_sp_short_input_pads_up():
    """Inputs shorter than the per-device halo pad up instead of crashing
    with opaque shape errors, and still match the reference."""
    n_dev = 4
    mesh = make_mesh(n_dev)
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ts = cfg.total_stride
    rng = np.random.default_rng(1)
    L = 2 * ts + 3  # far below the halo requirement
    x = (rng.normal(size=(1, L)) * 0.3).astype(np.float32)
    y_sp = np.asarray(sp_stream_denoise(params, cfg, jnp.asarray(x), mesh))
    assert y_sp.shape == (1, L)
    y_ref = _reference_zero_primed(params, cfg, x, _sp_total(cfg, L, n_dev))
    np.testing.assert_allclose(y_sp, y_ref, atol=3e-4, rtol=2e-3)


@pytest.mark.slow
def test_sp_batch2_normalized():
    """B=2 exercises the batch axis through the EMA all_gather reshape
    (a transposed-axes bug there is invisible at B=1)."""
    n_dev = 4
    mesh = make_mesh(n_dev)
    cfg = CleanUMambaConfig(**{**TINY, "normalize_input": True})
    params = init_params(jax.random.PRNGKey(0), cfg)
    ts = cfg.total_stride
    rng = np.random.default_rng(2)
    L = 41 * ts + 7
    # distinct scales per batch item so EMA rows differ
    x = np.stack([
        rng.normal(size=L).astype(np.float32) * 0.3,
        rng.normal(size=L).astype(np.float32) * 0.05,
    ])
    y_sp = np.asarray(sp_stream_denoise(params, cfg, jnp.asarray(x), mesh))
    y_ref = _reference_zero_primed(params, cfg, x, _sp_total(cfg, L, n_dev))
    np.testing.assert_allclose(y_sp, y_ref, atol=3e-4, rtol=2e-3)
