"""Single-frame (block=1) streaming latency: fused Pallas levels vs XLA.

The block=1 step is bound by weight HBM traffic plus per-op dispatch
(docs/performance.md "Streaming"); the fused per-level kernels
(ops/pallas/stream_fused.py) attack the dispatch term.  This script measures
ms/frame on the E8 full flagship for weights in {fp32, bf16, int8} with the
fused path off/on, fully on-device (lax.scan over frames, scalar sync — the
axon relay memoises identical executions, so inputs are varied per rep).

Run on the TPU chip:  python scripts/bench_stream_latency.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 2048  # amortise the ~30 ms tunnel RTT to <0.02 ms/frame
REPS = 3


def measure(params, cfg, dtype, packs, view, interpret=False):
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.streaming import stream_many, stream_prime

    fl, ts = cfg.frame_length, cfg.total_stride
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, fl + N_FRAMES * ts)).astype(np.float32) * 0.1
    prime = jax.jit(lambda p, f: stream_prime(view(p), cfg, f, dtype))
    state, _ = prime(params, jnp.asarray(audio[:, :fl]))
    blocks = jnp.asarray(
        np.stack([audio[:, fl + t * ts: fl + (t + 1) * ts]
                  for t in range(N_FRAMES)]))

    pa, pm = packs if packs is not None else (None, None)

    @jax.jit
    def run(p, s, b, scale, pa_):
        _, outs = stream_many(
            view(p), cfg, s, b * scale, dtype,
            packs=(pa_, pm) if pm is not None else None, interpret=interpret)
        return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

    float(run(params, state, blocks, 1.0, pa))  # compile
    dts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(run(params, state, blocks, 1.0 + 0.001 * (i + 1), pa))
        dts.append(time.perf_counter() - t0)
    return min(dts) / N_FRAMES * 1e3  # ms/frame


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models.cleanumamba import init_params
    from cleanumamba_tpu.ops.pallas.stream_fused import pack_stream_params

    interpret = jax.default_backend() == "cpu"  # smoke-test mode
    cfg = CleanUMambaConfig()  # E8 full
    params0 = init_params(jax.random.PRNGKey(0), cfg)
    ts, sr = cfg.total_stride, 16000
    results = {}
    for weights in ("fp32", "bf16", "int8"):
        if weights == "int8":
            from cleanumamba_tpu.quant import dequantize_params, quantize_params

            params = quantize_params(params0)
            view = lambda p: dequantize_params(p, jnp.bfloat16)  # noqa: E731
        elif weights == "bf16":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2
                else x, params0)
            view = lambda p: p  # noqa: E731
        else:
            params = params0
            view = lambda p: p  # noqa: E731
        cdt = jnp.float32 if weights == "fp32" else jnp.bfloat16
        act = jnp.float32 if weights == "fp32" else jnp.bfloat16
        budgets = [None, 1, 4, 10]  # None = XLA path; MiB pack budgets
        for budget in budgets:
            if budget is None:
                packs = None
            else:
                packs = pack_stream_params(params, cfg, cdt,
                                           budget=budget * 1024 * 1024)
                if packs[1] is None:
                    continue
            ms = measure(params, cfg, act, packs, view, interpret)
            rtf = (ts / sr) / (ms / 1e3)
            key = f"{weights}/{'xla' if budget is None else f'fused{budget}M'}"
            results[key] = {"ms_per_frame": round(ms, 4), "rtf": round(rtf, 1)}
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
