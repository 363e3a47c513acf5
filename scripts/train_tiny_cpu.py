"""From-scratch training evidence, relay-independent: a tiny CleanUMamba
trained on CPU with the REAL trainer stack (make_train_step: bf16 casts,
decay-masked adam, L1 + 3-res STFT loss) on synthetic noisy speech, then
evaluated on held-out items — the trained model must beat the unprocessed
noisy input on the eval metrics.

Usage: python scripts/train_tiny_cpu.py [--steps N]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FS = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--crop-sec", type=float, default=2.0)
    ap.add_argument("--eval-every", type=int, default=500)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cleanumamba_tpu.config import (
        CleanUMambaConfig,
        LossConfig,
        OptimizationConfig,
    )
    from cleanumamba_tpu.data.dataset import SyntheticDenoiseDataset
    from cleanumamba_tpu.eval.metrics import eval_waveform
    from cleanumamba_tpu.models.cleanumamba import (
        count_params,
        forward,
        init_params,
    )
    from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step

    cfg = CleanUMambaConfig(
        channels_H=16, max_H=48, encoder_n_layers=5,
        tsfm_n_layers=2, tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    print(f"# params: {count_params(params):,}", flush=True)

    opt_cfg = OptimizationConfig(n_iters=args.steps)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 3e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, LossConfig(), optimizer, bf16=True),
                   donate_argnums=(0, 1))

    train_ds = SyntheticDenoiseDataset(
        n_items=4096, crop_length_sec=args.crop_sec, seed=0)
    eval_ds = SyntheticDenoiseDataset(
        n_items=6, crop_length_sec=args.crop_sec, seed=999)

    def evaluate(p):
        rows = {"noisy": [], "denoised": []}
        for u in range(len(eval_ds)):
            clean, noisy = eval_ds[u]
            y = np.asarray(forward(p, jnp.asarray(noisy[None]), cfg))[0]
            rows["noisy"].append(eval_waveform(clean, noisy, FS))
            rows["denoised"].append(eval_waveform(clean, y, FS))
        keys = ("pesq_wb", "stoi", "si_sdr")
        return {k: {kk: round(float(np.mean([r[kk] for r in rows[k]])), 3)
                    for kk in keys} for k in rows}

    t0 = time.perf_counter()
    for it in range(args.steps):
        clean, noisy = train_ds[it % len(train_ds)]
        batch = (jnp.asarray(clean[None, None]), jnp.asarray(noisy[None, None]))
        params, opt_state, aux = step(params, opt_state, batch)
        if (it + 1) % args.eval_every == 0 or it == 0:
            loss = float(aux["loss"])
            print(json.dumps({"iter": it + 1, "loss": round(loss, 4),
                              "s_per_step": round(
                                  (time.perf_counter() - t0) / (it + 1), 2)}),
                  flush=True)
    ev = evaluate(params)
    delta = {k: round(ev["denoised"][k] - ev["noisy"][k], 3)
             for k in ev["noisy"]}
    print(json.dumps({"eval": ev, "delta": delta}))


if __name__ == "__main__":
    main()
