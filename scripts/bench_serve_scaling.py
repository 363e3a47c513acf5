"""Batch scaling of the block-streaming step (the serving question).

serve.py's premise is that concurrent sessions amortise the per-tick
weight read, so aggregate audio-s/s should grow near-linearly in batch
until compute saturates.  The first on-chip serving bench (slots=8,
block=16) measured a 10 ms tick — ~29x the batch-1 tick — which breaks
that model.  This probe times stream_step_block at several batch sizes
and, independently, with the two weight preparations in play:

  cast  — every fp32 leaf to bf16 (bench.py's headline prep)
  view  — streaming.prepare_weight_view('bf16'): 2-D+ non-sensitive
          leaves bf16, 1-D and state-dynamics leaves fp32 (Streamer/serve)

Run on the TPU chip:
  python scripts/bench_serve_scaling.py [block] [prep:batch[:impl] ...]
e.g.  python scripts/bench_serve_scaling.py 16 view:2 view:8:xla cast:8:pallas
Prints one JSON line per (prep, batch, impl) cell.  impl is the
bottleneck scan dispatch inside stream_step_block: "auto" (default —
Pallas on the chip), "xla" (the chunked associative scan), "pallas".
Default cells cover both preps at batches 1/2/8.

Measured 2026-08-20 (block 16, E8-full bf16): the XLA chunked scan's
(B, N, d_state, d_inner) fp32 coefficient tensors fall out of fusion at
batch 8 (67 MB per tensor per layer) — tick 9.9 ms vs 0.63 ms at batch 2,
identically for both weight preps.  The Pallas dispatch fix lives in
streaming._bottleneck_tokens; results in docs/performance.md (serving).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 4992  # per session
REPS = 3
BATCHES = (1, 2, 8)


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu import streaming
    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models.cleanumamba import init_params

    block = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    if len(sys.argv) > 2:
        cells = []
        for spec in sys.argv[2:]:
            parts = spec.split(":")
            cells.append((parts[0], int(parts[1]),
                          parts[2] if len(parts) > 2 else "auto"))
    else:
        cells = [(p, b, "auto") for p in ("cast", "view") for b in BATCHES]
    cfg = CleanUMambaConfig()
    dtype = jnp.bfloat16
    base = init_params(jax.random.PRNGKey(0), cfg)
    casted = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, base)
    viewed, view_fn = streaming.prepare_weight_view(base, "bf16", dtype)

    ts, fl, sr = cfg.total_stride, cfg.frame_length, 16000
    n_blocks = N_FRAMES // block
    rng = np.random.default_rng(0)

    preps = {"cast": (casted, lambda p: p), "view": (viewed, view_fn)}
    for prep, B, impl in cells:
            params, view = preps[prep]
            audio = rng.normal(
                size=(B, fl + N_FRAMES * ts)).astype(np.float32) * 0.1
            prime = jax.jit(
                lambda p, f: streaming.stream_prime(view(p), cfg, f, dtype))
            state, _ = prime(params, jnp.asarray(audio[:, :fl]))
            blocks = jnp.asarray(np.stack(
                [audio[:, fl + b * block * ts: fl + (b + 1) * block * ts]
                 for b in range(n_blocks)]))

            @jax.jit
            def run(p, s, bl, scale):
                def body(st, blk):
                    return streaming.stream_step_block(
                        view(p), cfg, st, blk * scale, dtype, scan_impl=impl)
                st, outs = jax.lax.scan(body, s, bl)
                return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

            t0 = time.perf_counter()
            float(run(params, state, blocks, 1.0))  # compile + warm
            compile_s = time.perf_counter() - t0
            dts = []
            for i in range(REPS):
                t0 = time.perf_counter()
                float(run(params, state, blocks, 1.0 + 0.001 * (i + 1)))
                dts.append(time.perf_counter() - t0)
            dt = min(dts)
            tick_ms = dt / n_blocks * 1e3
            agg = B * (N_FRAMES * ts / sr) / dt
            print(json.dumps({
                "prep": prep, "batch": B, "block": block, "impl": impl,
                "tick_ms": round(tick_ms, 4),
                "ms_per_frame_agg": round(dt / (n_blocks * block * B) * 1e3, 5),
                "agg_audio_s_per_s": round(agg, 1),
                "compile_s": round(compile_s, 1),
                "reps_ms": [round(d * 1e3, 1) for d in dts],
            }), flush=True)


if __name__ == "__main__":
    main()
