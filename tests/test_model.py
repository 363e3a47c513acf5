"""Model-level tests: param-count parity, forward/backward smoke, shape
invariance (reference has only inline smoke tests, network.py:15-42)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import count_params, forward, init_params

MINI = dict(channels_H=32, max_H=64, tsfm_n_head=4, tsfm_d_model=64, tsfm_d_inner=128)


def test_valid_length():
    cfg = CleanUMambaConfig()  # E8
    assert cfg.valid_length(1) == 766
    assert cfg.total_stride == 256
    cfg6 = CleanUMambaConfig(encoder_n_layers=6)
    assert cfg6.valid_length(1) == 190
    assert cfg6.total_stride == 64
    # valid lengths are fixed points
    assert cfg.valid_length(cfg.valid_length(160000)) == cfg.valid_length(160000)


@pytest.mark.parametrize(
    "kwargs,expected",
    [
        (MINI, 441_601),  # == Experiment_CleanU_Mamba.pkl
        pytest.param({}, 41_376_385,
                     marks=pytest.mark.slow),  # E8 full (41.37M, README.md:60), 22 s init
        (dict(MINI, bottleneck="lstm"), 443_009),  # == Experiment_CleanU_LSTM.pkl
        (dict(MINI, bottleneck="mha"), 442_945),  # == Experiment_CleanU_MHA.pkl
        (dict(MINI, bottleneck="mamba2"), 427_945),  # == Experiment_CleanU_Mamba2.pkl
    ],
)
def test_param_count_parity(kwargs, expected):
    cfg = CleanUMambaConfig(**kwargs)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert count_params(params) == expected


@pytest.mark.parametrize("bottleneck", ["mamba", "lstm", "mha", "mamba2"])
def test_forward_backward_smoke(bottleneck):
    cfg = CleanUMambaConfig(bottleneck=bottleneck, **{k: v for k, v in MINI.items()})
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4000)), jnp.float32)

    def loss(p):
        y = forward(p, x, cfg)
        return jnp.mean(y**2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


@pytest.mark.slow
def test_output_length_matches_input():
    cfg = CleanUMambaConfig(**MINI)
    params = init_params(jax.random.PRNGKey(0), cfg)
    for L in (900, 4000, 16000):
        x = jnp.zeros((1, L), jnp.float32)
        y = forward(params, x, cfg)
        assert y.shape == (1, L)


@pytest.mark.slow
def test_normalization_scaling_invariance():
    """normalize_input makes output scale with input std (reference :260-262,
    :318-319): f(a*x) == a*f(x) up to float error for a>0."""
    cfg = CleanUMambaConfig(**MINI)
    params = init_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3000)), jnp.float32)
    y1 = forward(params, x, cfg)
    y2 = forward(params, 4.0 * x, cfg)
    np.testing.assert_allclose(np.asarray(4.0 * y1), np.asarray(y2), atol=5e-3)


def test_return_skips():
    cfg = CleanUMambaConfig(**MINI)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 2000), jnp.float32)
    y, skips = forward(params, x, cfg, return_skips=True)
    assert len(skips) == cfg.encoder_n_layers + 1  # skips + tsfm_out
