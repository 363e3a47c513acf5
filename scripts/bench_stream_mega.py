"""Block=1 latency: mega-kernel vs per-level-fused vs XLA, released 442K.

The whole-frame mega-kernel (ops/pallas/stream_mega.py) reduces the step
to ONE dispatch (+4 XLA normalization ops); this measures what that buys
on the released flagship checkpoint.  RTT-amortised like
bench_stream_latency.py (2048 frames per timed sync).

Run on the TPU chip:  python scripts/bench_stream_mega.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 2048
REPS = 3
CKPT = "/root/reference/checkpoints/experiments/Experiment_CleanU_Mamba.pkl"


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.ops.pallas.stream_fused import pack_stream_params
    from cleanumamba_tpu.ops.pallas.stream_mega import pack_mega
    from cleanumamba_tpu.streaming import (
        stream_many,
        stream_prime,
        stream_step_mega,
    )

    interpret = jax.default_backend() == "cpu"
    cfg, params, _ = load_reference_checkpoint(CKPT)
    ts, fl, sr = cfg.total_stride, cfg.frame_length, 16000
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, fl + N_FRAMES * ts)).astype(np.float32) * 0.1
    blocks = jnp.asarray(np.stack(
        [audio[:, fl + t * ts: fl + (t + 1) * ts] for t in range(N_FRAMES)]))

    results = {}
    for mode, cdt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        act = cdt
        prime = jax.jit(lambda p, f: stream_prime(p, cfg, f, act))
        state, _ = prime(params, jnp.asarray(audio[:, :fl]))

        variants = {"xla": None,
                    "fused": pack_stream_params(params, cfg, cdt),
                    "mega": pack_mega(params, cfg, cdt)}
        for vn, packs in variants.items():
            if vn != "xla" and (packs is None or packs[1] is None):
                continue

            if vn == "mega":
                @jax.jit
                def run(p, s, b, scale, _m=packs):
                    def body(st, blk):
                        return stream_step_mega(cfg, st, blk * scale, _m,
                                                act, interpret=interpret)
                    st, outs = jax.lax.scan(body, s, b)
                    return jnp.sum(jnp.abs(outs.astype(jnp.float32)))
            else:
                @jax.jit
                def run(p, s, b, scale, _pk=packs):
                    _, outs = stream_many(p, cfg, s, b * scale, act,
                                          packs=_pk, interpret=interpret)
                    return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

            float(run(params, state, blocks, 1.0))
            dts = []
            for i in range(REPS):
                t0 = time.perf_counter()
                float(run(params, state, blocks, 1.0 + 0.001 * (i + 1)))
                dts.append(time.perf_counter() - t0)
            ms = min(dts) / N_FRAMES * 1e3
            key = f"{mode}/{vn}"
            results[key] = {"ms_per_frame": round(ms, 4),
                            "rtf": round((ts / sr) / (ms / 1e3), 1)}
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
