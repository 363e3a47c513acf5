"""End-to-end pruning-pipeline test on a tiny model + synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, STFTLossConfig
from cleanumamba_tpu.models.cleanumamba import count_params, forward, init_params
from cleanumamba_tpu.prune.driver import PruningConfig, get_state, pruning_pipeline

TINY = dict(
    channels_H=16,
    max_H=32,
    encoder_n_layers=4,
    tsfm_n_layers=2,
    tsfm_n_head=2,
    tsfm_d_model=32,
    tsfm_d_inner=64,
)


def test_get_state_phases():
    # batch 2, grad_samples 4, repeats 2, training 8 -> iters_per_step = (4+8)*2/2 = 12
    states = [
        get_state(i, 2, 8, 4, 2, steps_per_valid=2, steps_per_ckpt=4, steps_per_calibrate=2)
        for i in range(24)
    ]
    # first 4 iters: pruning (2 accumulate, prune at 1 and 3)
    assert states[0]["pruning"] and not states[0]["go_prune"]
    assert states[1]["go_prune"]
    assert states[3]["go_prune"]
    assert states[4]["training"] and not states[4]["pruning"]
    assert states[11]["training_done"]
    # next macro step repeats
    assert states[12]["pruning"] and states[13]["go_prune"]
    assert states[13]["prune_step"] == 2
    # cumulative sample counters (reference pruning/util.py:283-290)
    assert states[0]["prune_samples"] == 0 and states[0]["train_samples"] == 0
    assert states[2]["prune_samples"] == 4  # after first prune event
    assert states[4]["prune_samples"] == 8  # training phase: all grad samples seen
    assert states[11]["train_samples"] == 11 * 2 - 8  # (folded*batch - grad*repeats)
    assert states[12]["train_samples"] == 16  # one full macro-step of training


def test_get_state_rejects_misphased_configs():
    # grad_samples not a multiple of batch_size
    with pytest.raises(ValueError, match="pruning_grad_samples"):
        get_state(0, 3, 9, 4, 2, steps_per_valid=2, steps_per_ckpt=4, steps_per_calibrate=2)
    # training_samples not a multiple of batch_size
    with pytest.raises(ValueError, match="training_samples"):
        get_state(0, 2, 7, 4, 2, steps_per_valid=2, steps_per_ckpt=4, steps_per_calibrate=2)
    # steps_per_valid not a multiple of pruning_repeats
    with pytest.raises(ValueError, match="steps_per_valid"):
        get_state(0, 2, 8, 4, 3, steps_per_valid=2, steps_per_ckpt=4, steps_per_calibrate=2)


@pytest.mark.slow
def test_pruning_pipeline_shrinks_model():
    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    n0 = count_params(params)

    rng = np.random.default_rng(0)

    def data():
        while True:
            clean = rng.normal(size=(2, 2048)).astype(np.float32) * 0.3
            noisy = clean + 0.1 * rng.normal(size=(2, 2048)).astype(np.float32)
            yield clean, noisy

    pcfg = PruningConfig(
        training_samples=8,
        pruning_grad_samples=4,
        pruning_repeats=2,
        prune_steps=6,
        steps_per_valid=1000,
        steps_per_ckpt=1000,
        perc_prune_channels_per_iter=0.02,
        max_prune_importance_per_iter=None,
        min_channels_per_group=4,
        calibration=False,
        min_total_channels=10,
    )
    params2, opt_state, history, stopped = pruning_pipeline(
        params, cfg, loss_cfg, data(), pcfg, batch_size=2, max_iters=40
    )
    assert len(history) >= 2
    n1 = count_params(params2)
    assert n1 < n0, (n0, n1)
    # model still denoises
    clean, noisy = next(data())
    y = forward(params2, jnp.asarray(noisy), cfg)
    assert np.isfinite(np.asarray(y)).all()
    # monotone param decrease across prune events
    counts = [h["params"] for h in history]
    assert all(a > b for a, b in zip(counts, counts[1:]))


@pytest.mark.slow
def test_calibrator_scales():
    from cleanumamba_tpu.prune.calibrate import Calibrator
    from cleanumamba_tpu.prune.groups import build_groups
    from cleanumamba_tpu.losses import loss_fn as compute_loss

    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(stft_lambda=0.0)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    clean = jnp.asarray(rng.normal(size=(2, 2048)) * 0.3, jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(2, 2048)), jnp.float32)

    def loss_of(p):
        den = forward(p, noisy, cfg)
        l, _ = compute_loss(den, clean, loss_cfg)
        return l

    grads = jax.jit(jax.grad(loss_of))(params)
    groups = build_groups(params, cfg)[:4]  # a few groups for speed
    cal = Calibrator(ema_factor=0.5)
    scales = cal.gather(
        params, cfg, grads, groups, jax.jit(loss_of),
        "taylor_squared_individual*n_filters/n_parameters",
    )
    assert len(scales) >= 1
    assert all(np.isfinite(v) for v in scales.values())
    # EMA: second gather keeps keys, stays finite and >= min_scale
    cal.gather(params, cfg, grads, groups, jax.jit(loss_of),
               "taylor_squared_individual*n_filters/n_parameters")
    assert all(v >= cal.min_scale for v in cal.scales.values())
