"""Importance-calibration experiment CLI (reference
src/pruning/layerwise_calibration.py:161-276 __main__ harness): measure how
well each importance metric predicts the real loss change of pruning, per
group, and optionally render the log-log scatter."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.cli.denoise import load_any_checkpoint
from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, STFTLossConfig
from cleanumamba_tpu.data import SyntheticDenoiseDataset
from cleanumamba_tpu.losses import loss_fn
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.prune.calibrate import (
    importance_loss_experiment,
    scatter_importance_loss,
)
from cleanumamba_tpu.prune.groups import build_groups
from cleanumamba_tpu.utils import MetricsLogger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="checkpoint (default: fresh init)")
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--crop-sec", type=float, default=2.0)
    ap.add_argument("--sample-size", type=int, default=6)
    ap.add_argument("--n-remove", type=int, default=4)
    ap.add_argument("--out", default="./exp/calibration")
    ap.add_argument("--plot", default=None, help="write scatter PNG here")
    args = ap.parse_args(argv)

    if args.ckpt:
        cfg, params, _ = load_any_checkpoint(args.ckpt)
    else:
        cfg = CleanUMambaConfig()
        params = init_params(jax.random.PRNGKey(0), cfg)

    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(512,), hop_sizes=(50,), win_lengths=(240,))
    )
    ds = SyntheticDenoiseDataset(n_items=args.n_batches * args.batch_size,
                                 crop_length_sec=args.crop_sec, seed=42)
    batches = []
    for b in range(args.n_batches):
        items = [ds[b * args.batch_size + i] for i in range(args.batch_size)]
        clean = jnp.asarray(np.stack([c for c, _ in items]))
        noisy = jnp.asarray(np.stack([n for _, n in items]))
        batches.append((clean, noisy))

    def sample_loss(p, clean, noisy):
        y = forward(p, noisy, cfg)
        return loss_fn(y, clean, loss_cfg)[0]

    def loss_sampler(p):
        return float(np.mean([
            jax.jit(sample_loss)(p, c, n) for c, n in batches
        ]))

    # gradient sample for the taylor metrics (fixed first batch)
    grads = jax.grad(lambda p: sample_loss(p, *batches[0]))(params)
    groups = build_groups(params, cfg)
    sink = MetricsLogger.for_run(args.out)
    results = importance_loss_experiment(
        params, cfg, grads, groups, loss_sampler,
        sample_size=args.sample_size, n_remove=args.n_remove, sink=sink,
    )
    sink.close()
    print(f"{len(results)} probes -> {args.out}/metrics.jsonl")
    if args.plot:
        print("scatter:", scatter_importance_loss(results, out_path=args.plot))


if __name__ == "__main__":
    main()
