"""Block streaming == per-frame streaming == offline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.streaming import (
    stream_many,
    stream_prime,
    stream_step_block,
)

MINI = dict(
    channels_H=32, max_H=64, tsfm_n_head=4, tsfm_d_model=64, tsfm_d_inner=128,
    normalize_input=False,
)


@pytest.mark.slow
@pytest.mark.parametrize("bottleneck", ["mamba", "lstm"])
@pytest.mark.parametrize("N", [1, 4, 7])
@pytest.mark.parametrize("normalize_input", [False, True])
def test_block_equals_per_frame(bottleneck, N, normalize_input):
    cfg = CleanUMambaConfig(bottleneck=bottleneck,
                            **{**MINI, "normalize_input": normalize_input})
    params = init_params(jax.random.PRNGKey(0), cfg)
    ts, fl = cfg.total_stride, cfg.frame_length
    n_blocks = 3
    total_frames = N * n_blocks
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, fl + total_frames * ts)).astype(np.float32) * 0.3

    state, out0 = stream_prime(params, cfg, jnp.asarray(audio[:, :fl]))
    # per-frame reference
    blocks1 = jnp.asarray(
        np.stack([audio[:, fl + i * ts : fl + (i + 1) * ts] for i in range(total_frames)])
    )
    _, ref = stream_many(params, cfg, state, blocks1)

    # block mode
    st = state
    outs = []
    for b in range(n_blocks):
        chunk = jnp.asarray(audio[:, fl + b * N * ts : fl + (b + 1) * N * ts])
        st, out = stream_step_block(params, cfg, st, chunk)
        outs.append(np.asarray(out))
    block_out = np.concatenate(outs, axis=1)

    np.testing.assert_allclose(block_out, np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_block_matches_offline():
    cfg = CleanUMambaConfig(bottleneck="mamba", **MINI)
    params = init_params(jax.random.PRNGKey(1), cfg)
    ts, fl = cfg.total_stride, cfg.frame_length
    N = 8
    n_blocks = 4
    L = fl + N * n_blocks * ts
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, L)).astype(np.float32) * 0.3
    offline = np.asarray(forward(params, jnp.asarray(audio), cfg, scan_impl="xla"))

    state, out0 = stream_prime(params, cfg, jnp.asarray(audio[:, :fl]))
    outs = [np.asarray(out0)]
    st = state
    for b in range(n_blocks):
        chunk = jnp.asarray(audio[:, fl + b * N * ts : fl + (b + 1) * N * ts])
        st, out = stream_step_block(params, cfg, st, chunk)
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, axis=1)
    n = streamed.shape[1]
    np.testing.assert_allclose(streamed, offline[:, :n], atol=2e-4, rtol=1e-3)
