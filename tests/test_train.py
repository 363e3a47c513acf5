"""Training-stack tests: schedule parity, loss-goes-down, multi-device DP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import (
    CleanUMambaConfig,
    LossConfig,
    OptimizationConfig,
    STFTLossConfig,
)
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.parallel.mesh import batch_sharding, make_mesh
from cleanumamba_tpu.train.schedule import linear_warmup_cosine_decay
from cleanumamba_tpu.train.trainer import (
    make_optimizer,
    make_train_step,
    shard_train_step,
)
from cleanumamba_tpu.train.checkpoint import (
    find_max_epoch,
    load_latest,
    save_checkpoint,
)

TINY = dict(
    channels_H=8,
    max_H=16,
    encoder_n_layers=4,
    tsfm_n_layers=2,
    tsfm_n_head=2,
    tsfm_d_model=16,
    tsfm_d_inner=32,
)


def _tiny_setup(bf16=False, accum=1, batch=2, L=2048):
    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    opt_cfg = OptimizationConfig(n_iters=10_000, learning_rate=2e-3, bf16=bf16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # constant LR: the overfit tests shouldn't depend on warmup pacing
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-3)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(cfg, loss_cfg, optimizer, bf16=bf16)
    rng = np.random.default_rng(0)
    clean = rng.normal(size=(accum, batch, L)).astype(np.float32) * 0.3
    noisy = clean + 0.1 * rng.normal(size=clean.shape).astype(np.float32)
    return cfg, params, optimizer, opt_state, step_fn, (jnp.asarray(clean), jnp.asarray(noisy))


def test_schedule_matches_reference_semantics():
    sched = linear_warmup_cosine_decay(1e-4, 1000, divider=25, warmup_proportion=0.05)
    # step 0 -> first warmup value: lr_min + (1/50)*(lr_max-lr_min)
    lr_min = 1e-4 / 25
    assert np.isclose(float(sched(0)), lr_min + (1 / 50) * (1e-4 - lr_min))
    # end of warmup reaches lr_max
    assert np.isclose(float(sched(49)), 1e-4)
    # final value approaches lr_min/1e4
    assert float(sched(999)) < 1e-8 + lr_min / 1e4 * 1.1
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(50, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


@pytest.mark.slow
@pytest.mark.parametrize("bf16", [False, True])
def test_loss_decreases_overfit(bf16):
    """bf16=True runs the full bf16-activation path (params AND input cast;
    fp32 master weights, fp32 scan state/loss) — must still overfit."""
    cfg, params, optimizer, opt_state, step_fn, batch = _tiny_setup(bf16=bf16)
    step_fn = jax.jit(step_fn)
    losses = []
    for i in range(60):
        params, opt_state, aux = step_fn(params, opt_state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_grad_accumulation_equivalence():
    """accum=4 with micro-batch 1 == accum=1 with batch 4 (same grads).

    Only holds for per-element losses (L1); the spectral-convergence term is
    a batch-global Frobenius ratio, so it is excluded here (this is equally
    true of the reference's accumulation, train.py:251-299)."""
    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(stft_lambda=0.0)
    opt_cfg = OptimizationConfig(n_iters=10_000, learning_rate=2e-3, bf16=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-3)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(cfg, loss_cfg, optimizer, bf16=False)
    rng = np.random.default_rng(1)
    clean = rng.normal(size=(4, 1, 2048)).astype(np.float32)
    noisy = clean + 0.1 * rng.normal(size=clean.shape).astype(np.float32)
    p1, _, aux1 = jax.jit(step_fn)(params, opt_state, (jnp.asarray(clean), jnp.asarray(noisy)))
    c2 = clean.transpose(1, 0, 2)  # (1, 4, L)
    p2, _, aux2 = jax.jit(step_fn)(
        params, optimizer.init(params), (jnp.asarray(c2), jnp.asarray(noisy.transpose(1, 0, 2)))
    )
    # losses are means over different groupings of the same samples
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-4)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


@pytest.mark.slow
def test_multi_device_dp_step():
    """DP over the 8-device CPU mesh: batch sharded, params replicated."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    cfg, params, optimizer, opt_state, _, _ = _tiny_setup(batch=8)
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    step_fn = make_train_step(cfg, loss_cfg, optimizer, bf16=False,
                              axis_name="data")
    sharded = shard_train_step(step_fn, mesh)
    rng = np.random.default_rng(2)
    clean = rng.normal(size=(1, 8, 2048)).astype(np.float32)
    noisy = clean + 0.1 * rng.normal(size=clean.shape).astype(np.float32)
    with mesh:
        params2, opt_state2, aux = sharded(params, opt_state, (jnp.asarray(clean), jnp.asarray(noisy)))
    assert np.isfinite(float(aux["loss"]))
    # result equals the single-device step (same math, psum'd grads)
    cfg, params, optimizer, opt_state, step_fn, _ = _tiny_setup(batch=8)
    p_ref, _, aux_ref = jax.jit(step_fn)(params, opt_state, (jnp.asarray(clean), jnp.asarray(noisy)))
    np.testing.assert_allclose(float(aux["loss"]), float(aux_ref["loss"]), rtol=1e-5)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), params2, p_ref)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


@pytest.mark.slow
def test_nonfinite_grad_detection_and_skip():
    """aux['grads_finite'] flags NaN batches; skip_nonfinite_updates leaves
    params untouched on a poisoned step."""
    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(stft_lambda=0.0)
    opt_cfg = OptimizationConfig(n_iters=100)
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=False,
                                   skip_nonfinite_updates=True))
    rng = np.random.default_rng(0)
    clean = rng.normal(size=(1, 2, 2048)).astype(np.float32)
    noisy = clean + 0.1 * rng.normal(size=clean.shape).astype(np.float32)
    bad = noisy.copy()
    bad[0, 0, 100] = np.nan
    p1, o1, aux = step(params, opt_state, (jnp.asarray(clean), jnp.asarray(bad)))
    assert not bool(aux["grads_finite"])
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a clean step proceeds
    p2, o2, aux2 = step(params, opt_state, (jnp.asarray(clean), jnp.asarray(noisy)))
    assert bool(aux2["grads_finite"])
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(params))
    )
    assert changed


def test_checkpoint_roundtrip(tmp_path):
    cfg, params, optimizer, opt_state, step_fn, batch = _tiny_setup()
    d = str(tmp_path)
    save_checkpoint(d, 42, params, opt_state, cfg, run_id="abc")
    assert find_max_epoch(d) == 42
    ck = load_latest(d)
    assert ck["iter"] == 42 and ck["run_id"] == "abc"
    assert ck["config"] == cfg
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(ck["params"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_synthetic_dataset_loader():
    from cleanumamba_tpu.data import SyntheticDenoiseDataset, make_loader

    ds = SyntheticDenoiseDataset(n_items=8, crop_length_sec=0.5)
    clean, noisy = ds[0]
    assert clean.shape == noisy.shape == (8000,)
    # deterministic per index
    c2, n2 = ds[0]
    np.testing.assert_array_equal(clean, c2)
    it = make_loader(ds, batch_size=4, prefetch=1)
    cb, nb = next(it)
    assert cb.shape == (4, 8000)


@pytest.mark.slow
def test_remat_step_matches_plain():
    """remat=True (jax.checkpoint over the model forward) computes the same
    loss and (to float tolerance) the same gradients — it only trades
    recompute for activation memory — and the full remat step trains."""
    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    opt_cfg = OptimizationConfig(n_iters=1000)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-3)
    rng = np.random.default_rng(3)
    clean = jnp.asarray(rng.normal(size=(1, 2, 2048)).astype(np.float32) * 0.3)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(1, 2, 2048)).astype(np.float32))
    from cleanumamba_tpu.losses import loss_fn as _loss_fn
    from cleanumamba_tpu.models.cleanumamba import forward as _fwd

    params = init_params(jax.random.PRNGKey(0), cfg)

    def loss_plain(p):
        return _loss_fn(_fwd(p, noisy[0], cfg), clean[0], loss_cfg)[0]

    def loss_remat(p):
        y = jax.checkpoint(lambda pp: _fwd(pp, noisy[0], cfg))(p)
        return _loss_fn(y, clean[0], loss_cfg)[0]

    (l0, g0) = jax.jit(jax.value_and_grad(loss_plain))(params)
    (l1, g1) = jax.jit(jax.value_and_grad(loss_remat))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # the full remat step runs and trains
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=False,
                                   remat=True))
    losses = []
    for _ in range(25):
        params, opt_state, aux = step(params, opt_state, (clean, noisy))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
