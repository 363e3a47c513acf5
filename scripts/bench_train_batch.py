"""Training-throughput batch sweep at the final step configuration.

Re-measures docs/performance.md's batch-scaling claim (VERDICT r2 weak #3)
at the current code revision: E8 full, 10 s crops, bf16 params+activations,
L1 + 3-resolution STFT loss, batch in {2, 4, 8}.  Pipelined timing (N
dependent steps, one scalar sync) amortises the ~30 ms tunnel RTT to
~RTT/N per step.

Run on the TPU chip:  python scripts/bench_train_batch.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_STEPS = 16
L = 160_000  # 10 s @ 16 kHz


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.config import (
        CleanUMambaConfig,
        LossConfig,
        OptimizationConfig,
    )
    from cleanumamba_tpu.models.cleanumamba import init_params
    from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step

    cfg = CleanUMambaConfig()  # E8 full
    loss_cfg = LossConfig()
    opt_cfg = OptimizationConfig(n_iters=10_000)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-4)
    rng = np.random.default_rng(0)

    # cells: (batch, remat) — remat recomputes the forward in the backward
    # (jax.checkpoint), trading MXU headroom (19% busy) for HBM traffic
    # (the saved (B, L, C) activations).  Measured for the round-5
    # "spend the remaining traffic or prove the floor" item.
    cells = [(2, False), (4, False), (8, False), (2, True), (8, True)]
    if len(sys.argv) > 1:
        cells = [(int(s.split(":")[0]), s.endswith(":remat"))
                 for s in sys.argv[1:]]

    results = {}
    for batch, remat in cells:
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=True,
                                       remat=remat),
                       donate_argnums=(0, 1))
        clean = jnp.asarray(
            rng.normal(size=(1, batch, L)).astype(np.float32) * 0.3)
        noisy = clean + 0.1 * jnp.asarray(
            rng.normal(size=(1, batch, L)).astype(np.float32))

        for _ in range(2):
            params, opt_state, aux = step(params, opt_state, (clean, noisy))
        _ = float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(N_STEPS):
            params, opt_state, aux = step(params, opt_state, (clean, noisy))
        _ = float(aux["loss"])
        ms = (time.perf_counter() - t0) / N_STEPS * 1e3
        tag = f"batch{batch}" + ("+remat" if remat else "")
        results[tag] = {
            "ms_per_step": round(ms, 1),
            "audio_s_per_s": round(batch * (L / 16000) / (ms / 1e3), 0),
        }
        print(json.dumps({tag: results[tag]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
