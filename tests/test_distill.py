"""KD training-path test: student+adapters optimise against a frozen teacher."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp
import optax

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, STFTLossConfig
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.train.distill import make_kd_adapters, make_kd_train_step, skip_widths

TEACHER = dict(channels_H=16, max_H=32, encoder_n_layers=4, tsfm_n_layers=2,
               tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64)
STUDENT = dict(channels_H=8, max_H=16, encoder_n_layers=4, tsfm_n_layers=2,
               tsfm_n_head=2, tsfm_d_model=16, tsfm_d_inner=32)


@pytest.mark.slow
def test_kd_step_runs_and_improves():
    t_cfg = CleanUMambaConfig(**TEACHER)
    s_cfg = CleanUMambaConfig(**STUDENT)
    assert len(skip_widths(s_cfg)) == 5
    teacher = init_params(jax.random.PRNGKey(0), t_cfg)
    student = init_params(jax.random.PRNGKey(1), s_cfg)
    adapters = make_kd_adapters(jax.random.PRNGKey(2), s_cfg, t_cfg)
    loss_cfg = LossConfig(
        kd_p=1.0,
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,)),
    )
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init((student, adapters))
    step = jax.jit(make_kd_train_step(s_cfg, t_cfg, loss_cfg, optimizer))
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.normal(size=(2, 2048)) * 0.3, jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(2, 2048)), jnp.float32)
    losses, kds = [], []
    for _ in range(12):
        student, adapters, opt_state, aux = step(
            student, adapters, opt_state, teacher, (clean, noisy)
        )
        losses.append(float(aux["loss"]))
        kds.append(float(aux["kd_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert kds[-1] < kds[0]  # distillation term itself improves
