"""Roofline analysis of the block-streaming step (bench.py's headline path).

For each block size, lowers the scan-over-blocks program that bench.py
times, reads XLA's cost analysis (FLOPs + bytes accessed), measures the
RTT-amortised wall time, and reports the achieved HBM bandwidth and MXU
utilisation against the v5e peaks (819 GB/s, 197 TFLOP/s bf16).  This is
the evidence basis for "where the next factor comes from": if the step is
at HBM speed-of-light, only traffic removal (or a bigger block) helps; if
it is far below both peaks, it is dispatch/latency-bound and kernel fusion
helps.

Run on the TPU chip:  python scripts/roofline_block.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 9984  # divisible by every block size below
REPS = 3
HBM_PEAK_GBS = 819.0     # v5e
MXU_PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models.cleanumamba import init_params
    from cleanumamba_tpu.streaming import stream_prime, stream_step_block

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
    for block in (16, 32, 64, 128):
        n_blocks = N_FRAMES // block
        blocks = jnp.asarray(np.stack(
            [audio[:, fl + b * block * ts: fl + (b + 1) * block * ts]
             for b in range(n_blocks)]))

        def run(p, s, b, scale):
            def body(st, blk):
                return stream_step_block(p, cfg, st, blk * scale, dtype)
            _, outs = jax.lax.scan(body, s, b)
            return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

        jitted = jax.jit(run)
        # cost analysis of ONE block step — XLA's analysis of a while loop
        # counts the body once, not x trip count, so the scan program's
        # numbers are useless; lower the single step instead and scale.
        one = jax.jit(lambda p, s, b: stream_step_block(p, cfg, s, b, dtype))
        ca = one.lower(params, state, blocks[0]).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) * n_blocks
        bytes_acc = float(ca.get("bytes accessed", 0.0)) * n_blocks

        float(jitted(params, state, blocks, 1.0))  # warm
        dts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(jitted(params, state, blocks, 1.0 + 0.001 * (i + 1)))
            dts.append(time.perf_counter() - t0)
        sec = min(dts)
        ms_frame = sec / N_FRAMES * 1e3
        rtf = (ts / sr) / (ms_frame / 1e3)
        gbs = bytes_acc / sec / 1e9
        tflops = flops / sec / 1e12
        results[f"block{block}"] = {
            "ms_per_frame": round(ms_frame, 4),
            "rtf": round(rtf, 1),
            "flops_per_frame_M": round(flops / N_FRAMES / 1e6, 2),
            "bytes_per_frame_MB": round(bytes_acc / N_FRAMES / 1e6, 3),
            "achieved_GBs": round(gbs, 1),
            "hbm_sol_pct": round(100 * gbs / HBM_PEAK_GBS, 1),
            "achieved_TFLOPs": round(tflops, 2),
            "mxu_pct": round(100 * tflops / MXU_PEAK_TFLOPS, 1),
        }
        print(json.dumps({f"block{block}": results[f"block{block}"]}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
