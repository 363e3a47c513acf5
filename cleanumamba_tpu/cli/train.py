"""Training CLI (reference src/training/train.py:381-430 +
train_distributed.py — the multi-process launcher is replaced by
single-program data parallelism over all local devices).

Usage:
    python -m cleanumamba_tpu.cli.train -c configs/config.json \
        -e configs/exp/models/DNS-CleanUMamba-3N-E8.json [--synthetic]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import load_experiment_config, load_train_config
from cleanumamba_tpu.data import (
    CleanNoisyPairDataset,
    SyntheticDenoiseDataset,
    make_training_loader,
)
from cleanumamba_tpu.eval.validate import validate
from cleanumamba_tpu.models.cleanumamba import count_params, init_params
from cleanumamba_tpu.parallel.mesh import make_mesh
from cleanumamba_tpu.train.checkpoint import (
    find_max_epoch,
    load_checkpoint,
    save_checkpoint,
)
from cleanumamba_tpu.train.trainer import (
    make_device_data_steps,
    make_optimizer,
    make_train_step,
    shard_train_step,
)
from cleanumamba_tpu.utils import MetricsLogger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True, help="global config JSON")
    ap.add_argument("-e", "--exp", required=True, help="experiment JSON")
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic dataset (no DNS download needed)")
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--device-data", type=int, default=0, metavar="K",
                    help="synthetic batches generated ON device, K train "
                         "steps fused per dispatch (trainer."
                         "make_device_data_steps; implies --synthetic, "
                         "single-device only)")
    ap.add_argument("--model-parallel", type=int, default=1, metavar="M",
                    help="shard weights over M devices (Megatron-style TP, "
                         "parallel/tensor.py); remaining devices form the "
                         "data axis. Checkpoints are banked in canonical "
                         "(single-device) layout, so TP runs interoperate "
                         "with every other CLI.")
    args = ap.parse_args(argv)
    if args.device_data:
        args.synthetic = True
        if args.log_every % args.device_data:
            ap.error("--log-every must be a multiple of --device-data")
        if args.model_parallel > 1:
            ap.error("--device-data and --model-parallel are exclusive")

    tc = load_train_config(args.config)
    network, cfg, raw_exp = load_experiment_config(args.exp)
    exp_path = raw_exp.get("exp_path", "exp")
    ckpt_dir = os.path.join(tc.log_directory, exp_path, "checkpoint")

    opt = tc.optimization
    n_devices = len(jax.devices())
    tp = args.model_parallel
    if tp < 1:
        ap.error(f"--model-parallel must be >= 1, got {tp}")
    if n_devices % tp:
        ap.error(f"--model-parallel {tp} does not divide {n_devices} devices")
    dp_devices = n_devices // tp
    per_step_batch = opt.batch_size_per_device * dp_devices
    accum = max(1, opt.batch_size_total // per_step_batch)

    print(f"model: {network} ({cfg.bottleneck}) | devices: {n_devices} | "
          f"batch/step: {per_step_batch} x accum {accum}")

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    print(f"params: {count_params(params)/1e6:.3f}M")

    optimizer = make_optimizer(opt)
    opt_state = optimizer.init(params)

    # resume (reference train.py:166-227)
    start_iter = 0
    run_id = None
    t_prev = 0.0
    ck_iter = find_max_epoch(ckpt_dir) if tc.ckpt_iter == "max" else int(tc.ckpt_iter)
    if ck_iter >= 0:
        ck = load_checkpoint(os.path.join(ckpt_dir, f"{ck_iter}.pkl"))
        params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        if ck.get("opt_state") is not None:
            opt_state = jax.tree_util.tree_map(
                lambda ref, v: jnp.asarray(v), opt_state, ck["opt_state"]
            )
        start_iter = ck["iter"] + 1
        run_id = ck.get("run_id")
        t_prev = ck.get("training_time_seconds", 0.0)
        print(f"resumed from iter {ck['iter']}")

    sink = MetricsLogger.for_run(os.path.join(tc.log_directory, exp_path),
                                 run_id=run_id, config=raw_exp)
    run_id = sink.run_id

    stepper = None
    tp_mode = tp > 1
    bank_params = lambda p: p  # noqa: E731 — canonical-layout view for ckpt/valid
    bank_opt = lambda s: s  # noqa: E731
    if tp_mode:
        import contextlib

        import numpy as np
        from jax.sharding import Mesh

        from cleanumamba_tpu.parallel.tensor import (
            make_tp_train_step,
            tp_opt_state_like,
            tp_unprepare,
        )

        if dp_devices > 1:
            mesh = Mesh(np.array(jax.devices()).reshape(dp_devices, tp),
                        ("data", "model"))
            data_axis = "data"
        else:
            mesh = Mesh(np.array(jax.devices()), ("model",))
            data_axis = None
        make = make_tp_train_step(cfg, tc.loss, opt, mesh,
                                  data_axis=data_axis, bf16=opt.bf16,
                                  remat=opt.remat)
        canonical_params = params
        params_tp, fresh_opt, step_fn = make(params)
        # carry (possibly resumed) canonical moments into the TP layout; a
        # fresh opt_state permutes to itself (zeros + count), so this is
        # unconditional.  Template = CANONICAL params: the state's mu/nu
        # subtrees are canonical-structured here (mamba2's TP layout changes
        # the tree structure, not just leaf order).
        opt_state = jax.tree_util.tree_map(
            lambda ref, v: jnp.asarray(v), fresh_opt,
            tp_opt_state_like(opt_state, canonical_params, cfg, tp))
        params = params_tp
        bank_params = lambda p: tp_unprepare(jax.device_get(p), cfg, tp)  # noqa: E731
        bank_opt = lambda s: tp_opt_state_like(  # noqa: E731
            jax.device_get(s), params, cfg, tp, inverse=True)
        ctx = contextlib.nullcontext()
        print(f"tensor parallel: weights over {tp} devices"
              + (f" x data over {dp_devices}" if dp_devices > 1 else ""))
    elif args.device_data:
        L0 = int(tc.crop_length_sec * tc.sample_rate)
        if n_devices > 1:
            raw_step = make_train_step(cfg, tc.loss, optimizer, bf16=opt.bf16,
                                       axis_name="data", remat=opt.remat)
            ctx = mesh = make_mesh()
            stepper = make_device_data_steps(
                raw_step, opt.batch_size_per_device, L0, args.device_data,
                accum=accum, mesh=mesh)
        else:
            raw_step = make_train_step(cfg, tc.loss, optimizer, bf16=opt.bf16,
                                       remat=opt.remat)
            stepper = make_device_data_steps(
                raw_step, per_step_batch, L0, args.device_data, accum=accum)
            import contextlib

            ctx = contextlib.nullcontext()
    elif n_devices > 1:
        step_fn = make_train_step(cfg, tc.loss, optimizer, bf16=opt.bf16,
                                  axis_name="data", remat=opt.remat)
        mesh = make_mesh()
        step_fn = shard_train_step(step_fn, mesh)
        ctx = mesh
    else:
        step_fn = make_train_step(cfg, tc.loss, optimizer, bf16=opt.bf16,
                                  remat=opt.remat)
        step_fn = jax.jit(step_fn, donate_argnums=(0, 1))
        import contextlib

        ctx = contextlib.nullcontext()

    if args.synthetic or not tc.data_root or not os.path.isdir(tc.data_root):
        if not args.synthetic:
            print(f"data root {tc.data_root!r} not found -> synthetic dataset")
        ds = SyntheticDenoiseDataset(crop_length_sec=tc.crop_length_sec,
                                     sample_rate=tc.sample_rate)
        val_ds = SyntheticDenoiseDataset(n_items=16, crop_length_sec=tc.crop_length_sec,
                                         sample_rate=tc.sample_rate, seed=1234)
    else:
        ds = CleanNoisyPairDataset(tc.data_root, "training", tc.crop_length_sec,
                                   tc.sample_rate, dataset=tc.dataset)
        val_ds = CleanNoisyPairDataset(tc.data_root, "testing",
                                       sample_rate=tc.sample_rate,
                                       dataset=tc.dataset)
    loader = make_training_loader(ds, per_step_batch * accum)

    n_iter = start_iter
    t0 = time.time() - t_prev
    L = int(tc.crop_length_sec * tc.sample_rate)
    max_iters = args.max_iters or opt.n_iters
    key = jax.random.PRNGKey(1234 + start_iter)
    crossed = lambda every: (n_iter // every) > ((n_iter - stride) // every)  # noqa: E731
    with ctx:
        while n_iter < max_iters:
            if stepper is not None:
                key, sub = jax.random.split(key)
                params, opt_state, aux = stepper(params, opt_state, sub)
                stride = args.device_data
                n_iter += stride - 1  # land on the last fused iter
            else:
                stride = 1
                clean, noisy = next(loader)
                # both the DP and TP steps scan a leading accum axis
                # (reference batch_size_total semantics, train.py:232-299)
                clean = jnp.asarray(clean.reshape(accum, per_step_batch, L))
                noisy = jnp.asarray(noisy.reshape(accum, per_step_batch, L))
                params, opt_state, aux = step_fn(params, opt_state, (clean, noisy))

            if crossed(args.log_every) or n_iter == start_iter:
                print(
                    f"iter {n_iter}: loss={float(aux['loss']):.4f} "
                    f"rec={float(aux['reconstruct']):.4f} "
                    f"sc={float(aux.get('stft_sc', 0)):.4f} "
                    f"mag={float(aux.get('stft_mag', 0)):.4f} "
                    f"gnorm={float(aux['grad_norm']):.3f} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
                sink.log({k: float(v) for k, v in aux.items()}, step=n_iter,
                         kind="train")
            if crossed(tc.iters_per_valid) and n_iter >= tc.iters_per_valid:
                metrics = validate(bank_params(params), cfg, val_ds,
                                   max_items=tc.valid_max_items, pad_to=L)
                print(f"iter {n_iter}: valid " + " ".join(
                    f"{k}={v:.3f}" for k, v in metrics.items()))
                sink.log(metrics, step=n_iter, kind="valid")
            if crossed(tc.iters_per_ckpt) and n_iter >= tc.iters_per_ckpt:
                path = save_checkpoint(
                    ckpt_dir, n_iter, bank_params(params), bank_opt(opt_state),
                    cfg, run_id=run_id,
                    training_time_seconds=time.time() - t0,
                )
                print(f"saved {path}")
            n_iter += 1

    save_checkpoint(ckpt_dir, n_iter - 1, bank_params(params),
                    bank_opt(opt_state), cfg, run_id=run_id,
                    training_time_seconds=time.time() - t0)
    sink.close()


if __name__ == "__main__":
    main()
