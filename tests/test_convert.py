"""Checkpoint-conversion parity tests against the released reference pickles
(survey §6 "Verified checkpoint facts")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference

from cleanumamba_tpu.convert import load_reference_checkpoint
from cleanumamba_tpu.models.cleanumamba import count_params, forward

CKPTS = "/root/reference/checkpoints"


@requires_reference
@pytest.mark.parametrize(
    "rel,expected_params",
    [
        ("experiments/Experiment_CleanU_Mamba.pkl", 441_601),
        ("pruned/CleanUMamba-3N-E8_pruned-500K.pkl", 491_655),
        ("pruned/CleanUMamba-3N-E8_pruned-200K.pkl", 200_513),
        ("pruned/CleanUMamba-3N-E8_pruned-2M.pkl", 1_937_806),
    ],
)
def test_param_count(rel, expected_params):
    cfg, params, meta = load_reference_checkpoint(f"{CKPTS}/{rel}")
    assert count_params(params) == expected_params


@requires_reference
def test_pruned_ragged_widths():
    """E8-500K layer-0 mixer must infer d_inner=8, d_state=8, dt_rank=32
    from shapes alone (reference load_pruned_state_dict :540-545)."""
    from cleanumamba_tpu.models.bottleneck_mamba import mixer_dims

    cfg, params, _ = load_reference_checkpoint(
        f"{CKPTS}/pruned/CleanUMamba-3N-E8_pruned-500K.pkl"
    )
    d_model, d_inner, d_state, dt_rank, d_conv = mixer_dims(
        params["bottleneck"]["layers"][0]["mixer"]
    )
    assert (d_model, d_inner, d_state, dt_rank, d_conv) == (114, 8, 8, 32, 4)


@requires_reference
@pytest.mark.parametrize(
    "rel",
    [
        "experiments/Experiment_CleanU_Mamba.pkl",
        "experiments/Experiment_CleanU_LSTM.pkl",
        "experiments/Experiment_CleanU_MHA.pkl",
        "experiments/Experiment_CleanU_Mamba2.pkl",
        "pruned/CleanUMamba-3N-E8_pruned-200K.pkl",
        "pruned/CleanUMamba-3N-E6_pruned-200k.pkl",
    ],
)
@pytest.mark.slow
def test_converted_forward_runs(rel):
    cfg, params, _ = load_reference_checkpoint(f"{CKPTS}/{rel}")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4000)) * 0.1, jnp.float32)
    y = forward(params, x, cfg)
    assert y.shape == (1, 4000)
    assert np.isfinite(np.asarray(y)).all()
    # a trained denoiser should not explode on small-amplitude noise
    assert float(jnp.abs(y).max()) < 10.0
