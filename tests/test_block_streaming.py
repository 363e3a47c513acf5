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
@pytest.mark.parametrize("bottleneck", ["mamba", "mamba2", "lstm"])
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
@pytest.mark.parametrize("bottleneck", ["mamba", "mamba2"])
def test_block_pallas_scan_matches_xla(bottleneck):
    """The serving fix: stream_step_block's bottleneck dispatches to the
    Pallas scan kernel on TPU (the XLA chunked scan's fp32 coefficient
    tensors fall out of fusion at serving batch — measured 9.9 ms vs
    0.63 ms tick at batch 8 vs 2, scripts/bench_serve_scaling.py).
    Interpret mode pins the Pallas branch == the XLA branch on CPU."""
    cfg = CleanUMambaConfig(bottleneck=bottleneck, **MINI)
    params = init_params(jax.random.PRNGKey(2), cfg)
    ts, fl = cfg.total_stride, cfg.frame_length
    N = 5
    rng = np.random.default_rng(2)
    audio = rng.normal(size=(3, fl + N * ts)).astype(np.float32) * 0.3
    state, _ = stream_prime(params, cfg, jnp.asarray(audio[:, :fl]))
    chunk = jnp.asarray(audio[:, fl:])
    st_x, out_x = stream_step_block(params, cfg, state, chunk,
                                    scan_impl="xla")
    st_p, out_p = stream_step_block(params, cfg, state, chunk,
                                    scan_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_p),
                    jax.tree_util.tree_leaves(st_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


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
