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
    s = Streamer(params, cfg)
    out = np.concatenate([s.feed(P), s.flush()], axis=1)
    return out[:, ctx : ctx + L]


@pytest.mark.parametrize("n_dev,normalize", [(8, False), (4, False), (1, False),
                                             (8, True), (4, True), (1, True)])
def test_sp_denoise_matches_streaming(n_dev, normalize):
    assert jax.device_count() >= n_dev
    mesh = make_mesh(n_dev)
    cfg = CleanUMambaConfig(**{**TINY, "normalize_input": normalize})
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
