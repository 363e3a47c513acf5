"""On-device synthetic data generation + fused multi-step training driver.

data/synth_device.py draws the SyntheticDenoiseDataset distribution family
directly on the device; trainer.make_device_data_steps scans whole train
steps over such batches so one dispatch advances K iterations with zero
host->device data traffic (no reference counterpart — its data path is a
torch DataLoader over wav files, src/dataset.py).
"""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, OptimizationConfig
from cleanumamba_tpu.data.synth_device import synth_batch
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.train.trainer import (
    make_device_data_steps,
    make_optimizer,
    make_train_step,
)

FS = 16000


def test_synth_batch_distribution():
    c, n = synth_batch(jax.random.PRNGKey(0), 4, 2 * FS)
    c, n = np.asarray(c), np.asarray(n)
    assert c.shape == n.shape == (4, 2 * FS) and c.dtype == np.float32
    # peak scaling U(0.2, 0.8) per item (dataset.py:196-197)
    peaks = np.abs(c).max(axis=1)
    assert (peaks > 0.19).all() and (peaks < 0.81).all()
    # mixed at SNR within the configured U(0, 15) dB range
    noise = n - c
    snr = 10 * np.log10((c ** 2).mean(1) / (noise ** 2).mean(1))
    assert (snr > -0.5).all() and (snr < 15.5).all()
    # deterministic per key, distinct across keys
    c2, _ = synth_batch(jax.random.PRNGKey(0), 4, 2 * FS)
    assert np.array_equal(c, np.asarray(c2))
    c3, _ = synth_batch(jax.random.PRNGKey(1), 4, 2 * FS)
    assert not np.array_equal(c, np.asarray(c3))


@pytest.mark.slow
def test_device_data_steps_match_manual_loop():
    """The fused K-step scan must equal K sequential step_fn calls fed the
    same on-device batches (same key-folding order)."""
    cfg = CleanUMambaConfig(
        channels_H=8, max_H=16, encoder_n_layers=4,
        tsfm_n_layers=1, tsfm_n_head=2, tsfm_d_model=16, tsfm_d_inner=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(OptimizationConfig(learning_rate=1e-4))
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, LossConfig(), optimizer, bf16=False)

    K, B, L = 3, 2, FS
    # manual replication of the scan body runs FIRST: the stepper donates
    # its params/opt_state buffers
    p2, o2, key = params, opt_state, jax.random.PRNGKey(7)
    jstep = jax.jit(step)
    for _ in range(K):
        key, sub = jax.random.split(key)
        clean, noisy = synth_batch(sub, B, L)
        p2, o2, aux2 = jstep(p2, o2, (clean[None], noisy[None]))

    stepper = make_device_data_steps(step, B, L, K)
    p1, o1, aux = stepper(params, opt_state, jax.random.PRNGKey(7))
    assert np.isfinite(float(aux["loss"]))
    np.testing.assert_allclose(float(aux["loss"]), float(aux2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_device_data_steps_sharded():
    """8-device DP composition: each device synthesizes its local batch from
    its axis-folded key, gradients pmean in-step; params stay replicated and
    the fused scan advances K iterations in one dispatch."""
    from cleanumamba_tpu.parallel.mesh import make_mesh

    cfg = CleanUMambaConfig(
        channels_H=8, max_H=16, encoder_n_layers=4,
        tsfm_n_layers=1, tsfm_n_head=2, tsfm_d_model=16, tsfm_d_inner=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(OptimizationConfig(learning_rate=1e-4))
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, LossConfig(), optimizer, bf16=False,
                           axis_name="data")
    mesh = make_mesh()
    assert mesh.devices.size == 8
    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    stepper = make_device_data_steps(step, 1, FS, 2, mesh=mesh)
    p1, o1, aux = stepper(params, opt_state, jax.random.PRNGKey(3))
    loss = float(aux["loss"])
    assert np.isfinite(loss) and loss > 0
    # params changed and remained fully addressable/replicated
    moved = sum(float(np.abs(np.asarray(a) - b).max())
                for a, b in zip(jax.tree_util.tree_leaves(p1), before))
    assert moved > 0
