"""Block-size sweep of the streaming path, RTT-amortised.

Re-measures docs/performance.md's "block (latency added)" table with the
corrected methodology (>=2048 frames per timed sync so the axon tunnel's
~30 ms RTT adds <0.02 ms/frame — see bench_stream_latency.py).  E8 full,
bf16 weights+activations, block sizes 1..16 frames via ``stream_step_block``
(block=1 uses ``stream_step``), the same configuration as the headline
``bench.py``.

Run on the TPU chip:  python scripts/bench_stream_blocks.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 9984  # divisible by 1..16; >=200 ms per timed sync at every block size
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models.cleanumamba import init_params
    from cleanumamba_tpu.streaming import (
        stream_many,
        stream_prime,
        stream_step_block,
    )

    cfg = CleanUMambaConfig()  # E8 full, matches bench.py
    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        init_params(jax.random.PRNGKey(0), cfg))

    ts, fl, sr = cfg.total_stride, cfg.frame_length, 16000
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, fl + N_FRAMES * ts)).astype(np.float32) * 0.1
    prime = jax.jit(lambda p, f: stream_prime(p, cfg, f, dtype))
    state, _ = prime(params, jnp.asarray(audio[:, :fl]))

    results = {}
    for block in (1, 2, 4, 8, 16):
        n_blocks = N_FRAMES // block
        blocks = jnp.asarray(np.stack(
            [audio[:, fl + b * block * ts: fl + (b + 1) * block * ts]
             for b in range(n_blocks)]))

        if block == 1:
            @jax.jit
            def run(p, s, b, scale):
                _, outs = stream_many(p, cfg, s, b[:, :, 0, :] * scale
                                      if b.ndim == 4 else b * scale, dtype)
                return jnp.sum(jnp.abs(outs.astype(jnp.float32)))
        else:
            @jax.jit
            def run(p, s, b, scale):
                def body(st, blk):
                    return stream_step_block(p, cfg, st, blk * scale, dtype)
                _, outs = jax.lax.scan(body, s, b)
                return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

        float(run(params, state, blocks, 1.0))  # compile
        dts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(run(params, state, blocks, 1.0 + 0.001 * (i + 1)))
            dts.append(time.perf_counter() - t0)
        ms = min(dts) / N_FRAMES * 1e3
        rtf = (ts / sr) / (ms / 1e3)
        results[f"block{block}"] = {
            "ms_per_frame": round(ms, 4), "rtf": round(rtf, 1),
            "latency_ms": round(block * ts / sr * 1e3, 1)}
        print(json.dumps({f"block{block}": results[f"block{block}"]}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
