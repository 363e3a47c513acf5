"""Finetune-path tests (reference src/training/train_finetune.py):
ragged pruned checkpoint -> N finetune steps -> loss drops -> save/reload
with ragged shapes intact.  Plus Mamba2 train-step gradient coverage
(differentiating through ops.scan.ssd_scan)."""

import json
import os

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
from cleanumamba_tpu.models.cleanumamba import count_params, init_params
from cleanumamba_tpu.prune.pruner import apply_pruning
from cleanumamba_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step

TINY = dict(
    channels_H=8,
    max_H=16,
    encoder_n_layers=4,
    tsfm_n_layers=2,
    tsfm_n_head=2,
    tsfm_d_model=16,
    tsfm_d_inner=32,
)


def _ragged_checkpoint(tmp_path):
    """Build a tiny model, prune two groups to ragged widths, save it."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    n0 = count_params(params)
    params, _, _ = apply_pruning(
        params, {"skip_conn_0": [0, 1], "d_state0": [0]}, cfg
    )
    assert count_params(params) < n0
    ckpt_dir = str(tmp_path / "pruned")
    save_checkpoint(ckpt_dir, 0, params, None, cfg)
    path = os.path.join(ckpt_dir, "0.pkl")
    assert os.path.exists(path)
    return cfg, params, path


@pytest.mark.slow
def test_finetune_cli_ragged_roundtrip(tmp_path):
    """Drive cli/finetune.py end-to-end on a ragged checkpoint: the loop must
    run, log decreasing loss to the JSONL sink, and save a reloadable
    checkpoint preserving every ragged shape."""
    from cleanumamba_tpu.cli.finetune import main

    cfg, pruned_params, ckpt_path = _ragged_checkpoint(tmp_path)
    out = str(tmp_path / "ft" / "checkpoint")
    main([
        "--ckpt", ckpt_path,
        "--synthetic",
        "--iters", "25",
        "--lr", "1e-3",
        "--crop-sec", "0.128",
        "--out", out,
        "--log-every", "1",
    ])
    # saved checkpoint reloads with identical (ragged) shapes
    ck = load_checkpoint(os.path.join(out, "24.pkl"))
    assert ck["config"] == cfg
    for a, b in zip(
        jax.tree_util.tree_leaves(ck["params"]),
        jax.tree_util.tree_leaves(pruned_params),
    ):
        assert np.shape(a) == np.shape(b)
    # the metrics sink recorded a decreasing loss trajectory
    run_dir = os.path.dirname(out.rstrip("/"))
    logs = []
    for root, _, files in os.walk(run_dir):
        for f in files:
            if f.endswith(".jsonl"):
                with open(os.path.join(root, f)) as fh:
                    logs += [json.loads(l) for l in fh if l.strip()]
    losses = [r["loss"] for r in logs
              if r.get("_kind") == "train" and isinstance(r.get("loss"), (int, float))]
    assert len(losses) >= 10, f"sink recorded too few train rows: {logs[:3]}"
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0], losses


@pytest.mark.slow  # 21-24 s per family
@pytest.mark.parametrize("bottleneck", ["mamba2", "mamba_s4"])
def test_bottleneck_train_step_overfits(bottleneck):
    """Train-step gradient coverage for the non-default bottlenecks: loss
    decreases and every update stays finite when differentiating through
    ssd_scan (mamba2) / the S4 FFT kernel (mamba_s4)."""
    cfg = CleanUMambaConfig(bottleneck=bottleneck, **TINY)
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    opt_cfg = OptimizationConfig(n_iters=10_000, learning_rate=2e-3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    from cleanumamba_tpu.models.cleanumamba import prepare_for_length

    params = prepare_for_length(params, cfg, 2048)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=False))
    rng = np.random.default_rng(0)
    clean = rng.normal(size=(1, 2, 2048)).astype(np.float32) * 0.3
    noisy = clean + 0.1 * rng.normal(size=clean.shape).astype(np.float32)
    batch = (jnp.asarray(clean), jnp.asarray(noisy))
    losses = []
    for _ in range(40):
        params, opt_state, aux = step(params, opt_state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all(), losses[::10]
    assert losses[-1] < losses[0] * 0.9, losses[::10]
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ssd_scan_grad_matches_mamba1_scan():
    """ssd_scan's AD gradients agree with the Mamba1 selective scan's custom
    VJP on the equivalent problem (scalar-per-head decay == A rows constant
    across d_state broadcast into per-channel form)."""
    from cleanumamba_tpu.ops.scan import selective_scan_grad, ssd_scan

    rng = np.random.default_rng(1)
    Bz, L, H, P, N = 1, 64, 2, 4, 8
    d_inner = H * P
    x = rng.normal(size=(Bz, L, H, P)).astype(np.float32)
    dt = np.abs(rng.normal(size=(Bz, L, H))).astype(np.float32) * 0.1 + 0.05
    A_head = -np.abs(rng.normal(size=(H,))).astype(np.float32) - 0.1
    Bm = rng.normal(size=(Bz, L, N)).astype(np.float32)
    Cm = rng.normal(size=(Bz, L, N)).astype(np.float32)

    def loss_ssd(xj, dtj, Aj, Bj, Cj):
        y, _ = ssd_scan(xj, dtj, Aj, Bj, Cj, chunk=16)
        return jnp.sum(y ** 2)

    # Mamba1 equivalent: u (B, L, d_inner) with per-channel dt/A
    def loss_m1(xj, dtj, Aj, Bj, Cj):
        u = xj.reshape(Bz, L, d_inner)
        dtc = jnp.repeat(dtj, P, axis=-1)  # (B, L, H*P)
        Ac = jnp.repeat(Aj, P)[:, None] * jnp.ones((d_inner, N))
        y, _ = selective_scan_grad(u, dtc, Ac, Bj, Cj, None, None, 16)
        return jnp.sum(y ** 2)

    args = tuple(map(jnp.asarray, (x, dt, A_head, Bm, Cm)))
    v1, g1 = jax.value_and_grad(loss_ssd, argnums=(0, 1, 3, 4))(*args)
    v2, g2 = jax.value_and_grad(loss_m1, argnums=(0, 1, 3, 4))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    for a, b, name in zip(g1, g2, ("x", "dt", "B", "C")):
        a = np.asarray(a).reshape(np.asarray(b).shape)
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=name
        )
