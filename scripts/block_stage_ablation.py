"""Stage ablation of the block-16 streaming step (bench.py's headline path).

Times the scan-over-blocks program with (a) the full step, (b) the
bottleneck replaced by identity, and (c) the bottleneck alone (tokens fed
directly), attributing the per-frame cost between encoder/decoder GEMMs
and the sequential SSM token path.  Also compares the XLA chunked
selective scan against the Pallas scan kernel inside the block bottleneck.

Run on the TPU chip:  python scripts/block_stage_ablation.py [block]
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 9984
REPS = 3


def timed(fn, *args):
    float(fn(*args))  # warm/compile
    dts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        dts.append(time.perf_counter() - t0)
    return min(dts)


def main():
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu import streaming
    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models.cleanumamba import init_params

    block = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = CleanUMambaConfig()
    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        init_params(jax.random.PRNGKey(0), cfg))

    ts, fl, sr = cfg.total_stride, cfg.frame_length, 16000
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, fl + N_FRAMES * ts)).astype(np.float32) * 0.1
    prime = jax.jit(lambda p, f: streaming.stream_prime(p, cfg, f, dtype))
    state, _ = prime(params, jnp.asarray(audio[:, :fl]))

    n_blocks = N_FRAMES // block
    blocks = jnp.asarray(np.stack(
        [audio[:, fl + b * block * ts: fl + (b + 1) * block * ts]
         for b in range(n_blocks)]))

    def scan_step(p, s, b, scale):
        def body(st, blk):
            return streaming.stream_step_block(p, cfg, st, blk * scale, dtype)
        _, outs = jax.lax.scan(body, s, b)
        return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

    results = {}

    # (a) full step
    sec = timed(jax.jit(scan_step), params, state, blocks, 1.0)
    results["full_ms_per_frame"] = round(sec / N_FRAMES * 1e3, 4)
    print(json.dumps({"full": results["full_ms_per_frame"]}), flush=True)

    # (b) bottleneck ablated: identity over the (B, N, d_model) tokens
    orig = streaming._bottleneck_tokens
    try:
        streaming._bottleneck_tokens = lambda p, c, cache, x: (cache, x)
        sec = timed(jax.jit(scan_step), params, state, blocks, 1.0)
    finally:
        streaming._bottleneck_tokens = orig
    results["no_bottleneck_ms_per_frame"] = round(sec / N_FRAMES * 1e3, 4)
    print(json.dumps({"no_bottleneck": results["no_bottleneck_ms_per_frame"]}),
          flush=True)

    # (c) bottleneck alone: scan _bottleneck_tokens over token blocks
    d_model = cfg.tsfm_d_model
    tokens = jnp.asarray(
        rng.normal(size=(n_blocks, 1, block, d_model)).astype(np.float32)
    ).astype(dtype)
    cache0 = state["bottleneck"]

    def scan_bott(p, c0, toks, scale):
        def body(c, t):
            c, y = streaming._bottleneck_tokens(p, cfg, c, t * scale)
            return c, jnp.sum(jnp.abs(y.astype(jnp.float32)))
        _, sums = jax.lax.scan(body, c0, toks)
        return jnp.sum(sums)

    sec = timed(jax.jit(scan_bott), params, cache0, tokens, 1.0)
    results["bottleneck_only_ms_per_frame"] = round(sec / N_FRAMES * 1e3, 4)
    print(json.dumps(
        {"bottleneck_only": results["bottleneck_only_ms_per_frame"]}),
        flush=True)

    print(json.dumps({"block": block, **results}))


if __name__ == "__main__":
    main()
