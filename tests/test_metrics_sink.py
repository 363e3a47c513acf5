"""Persistent metrics sink: JSONL schema, crash tolerance, and kill/resume
trajectory reconstruction through the pruning pipeline.

Replaces the reference's wandb system-of-record (train.py:196-211,
pruning/util.py:146-212) with an append-only JSONL file keyed by run_id.
"""

import pytest
import json
import os

import numpy as np
import jax

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, STFTLossConfig
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.prune.driver import PruningConfig, pruning_pipeline
from cleanumamba_tpu.train.checkpoint import load_latest
from cleanumamba_tpu.utils import MetricsLogger, read_history

TINY = dict(
    channels_H=16, max_H=32, encoder_n_layers=4, tsfm_n_layers=2,
    tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64,
)


def test_schema_and_append(tmp_path):
    sink = MetricsLogger.for_run(str(tmp_path), config={"lr": 1e-4})
    sink.log({"loss": np.float32(1.5), "gnorm": 2.0}, step=0)
    sink.log({"stoi": 0.9}, step=10, kind="valid")
    sink.close()
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    rows = read_history(path)
    assert [r["_kind"] for r in rows] == ["config", "train", "valid"]
    for r in rows:
        assert r["_run_id"] == sink.run_id
        assert "_timestamp" in r and "_runtime" in r
    assert rows[1]["_step"] == 0 and rows[1]["loss"] == 1.5
    # filtered read
    assert read_history(path, kind="valid")[0]["stoi"] == 0.9


def test_torn_line_tolerated(tmp_path):
    sink = MetricsLogger.for_run(str(tmp_path))
    sink.log({"a": 1}, step=0)
    sink.close()
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    with open(path, "a") as f:
        f.write('{"_run_id": "x", "b": ')  # simulated crash mid-write
    rows = read_history(path)
    assert len(rows) == 1 and rows[0]["a"] == 1


def test_resume_appends_same_run(tmp_path):
    s1 = MetricsLogger.for_run(str(tmp_path))
    s1.log({"a": 1}, step=0)
    s1.close()
    s2 = MetricsLogger.for_run(str(tmp_path), run_id=s1.run_id)
    s2.log({"a": 2}, step=1)
    s2.close()
    rows = read_history(os.path.join(str(tmp_path), "metrics.jsonl"),
                        run_id=s1.run_id)
    assert [r.get("a") for r in rows] == [1, 2]
    # _runtime keeps accumulating across the resume
    assert rows[-1]["_runtime"] >= rows[0]["_runtime"]


def _data_iter(seed=0):
    rng = np.random.default_rng(seed)
    while True:
        clean = rng.normal(size=(2, 2048)).astype(np.float32) * 0.3
        noisy = clean + 0.1 * rng.normal(size=(2, 2048)).astype(np.float32)
        yield clean, noisy


def _prune_cfg():
    # batch 2, grad 4, train 8, repeats 2 -> macro step of 12 iters,
    # ckpt at prune_step 1 & 3 (steps_per_ckpt=2) == iters 11, 23
    return PruningConfig(
        training_samples=8, pruning_grad_samples=4, pruning_repeats=2,
        prune_steps=100, steps_per_valid=1000, steps_per_ckpt=2,
        perc_prune_channels_per_iter=0.02, max_prune_importance_per_iter=None,
        min_channels_per_group=4, calibration=False, min_total_channels=10,
    )


@pytest.mark.slow
def test_killed_pruning_run_reconstructs_trajectory(tmp_path):
    cfg = CleanUMambaConfig(**TINY)
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt_dir = os.path.join(str(tmp_path), "checkpoint")

    sink = MetricsLogger.for_run(str(tmp_path))
    run_id = sink.run_id

    def log_fn(rec):
        rec = dict(rec)
        sink.log(rec, step=rec.get("n_iter"), kind=rec.pop("kind", "prune"))

    # phase 1: run past the first checkpoint (iter 11), "die" at iter 14
    pruning_pipeline(
        params, cfg, loss_cfg, _data_iter(), _prune_cfg(), batch_size=2,
        ckpt_dir=ckpt_dir, log_fn=log_fn, max_iters=14, log_every=4,
        run_id=run_id,
    )
    sink.close()

    ck = load_latest(ckpt_dir)
    assert ck is not None and ck["iter"] == 11 and ck["run_id"] == run_id

    # phase 2: resume from the checkpoint with the same run_id
    sink2 = MetricsLogger.for_run(str(tmp_path), run_id=run_id)

    def log_fn2(rec):
        rec = dict(rec)
        sink2.log(rec, step=rec.get("n_iter"), kind=rec.pop("kind", "prune"))

    import jax.numpy as jnp
    params2 = jax.tree_util.tree_map(jnp.asarray, ck["params"])
    opt_state2 = jax.tree_util.tree_map(jnp.asarray, ck["opt_state"])
    pruning_pipeline(
        params2, ck["config"], loss_cfg, _data_iter(1), _prune_cfg(),
        batch_size=2, ckpt_dir=ckpt_dir, log_fn=log_fn2, max_iters=24,
        start_iter=ck["iter"] + 1, opt_state=opt_state2, log_every=4,
        run_id=run_id,
    )
    sink2.close()

    # the on-disk trajectory is the union of both phases under one run_id
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    prunes = read_history(path, run_id=run_id, kind="prune")
    # uninterrupted phase sequence: go_prune at iters 1,3 (macro 0) and 13,15
    assert [r["n_iter"] for r in prunes] == [1, 3, 13, 15]
    assert [r["prune_step"] for r in prunes] == [0, 1, 2, 3]
    # params monotone decreasing across the kill/resume boundary
    counts = [r["params"] for r in prunes]
    assert all(a > b for a, b in zip(counts, counts[1:]))
    trains = read_history(path, run_id=run_id, kind="train")
    assert {r["n_iter"] for r in trains} <= set(range(40))
    assert len(trains) >= 2  # training-phase loss records from both phases
