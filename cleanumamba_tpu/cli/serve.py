"""Concurrent-session serving demo + aggregate throughput bench.

TPU-native counterpart (and extension) of the reference's one-stream demo
(src/examples/streaming_demo.py): serve.py multiplexes N independent
denoise sessions through ONE compiled batched step, so the weights stream
from HBM once per tick regardless of how many sessions ride it.

    # functional demo: staggered synthetic sessions through the multiplexer
    python -m cleanumamba_tpu.cli.serve --ckpt <pkl> --slots 4 --sessions 3

    # aggregate serving throughput (device-resident timing, bench.py rules)
    python -m cleanumamba_tpu.cli.serve --ckpt <pkl> --slots 8 --block 16 \
        --bench --seconds 40

The bench measures the compute side the way bench.py does (scan many ticks
on-device, sync one scalar — the axon tunnel charges ~30 ms per fetch and
memoises repeated identical executions): it reports aggregate
audio-seconds/second across all slots, i.e. how much concurrent real-time
audio one chip sustains at this latency point.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu.serve import SessionMultiplexer


def _load(args):
    if args.ckpt == "flagship":
        # bench.py's headline geometry: E8 full (41.37M params), synthetic
        # init — there is no released full-model checkpoint
        from cleanumamba_tpu.config import CleanUMambaConfig
        from cleanumamba_tpu.models.cleanumamba import init_params

        cfg = CleanUMambaConfig()
        return cfg, init_params(jax.random.PRNGKey(0), cfg)
    from cleanumamba_tpu.cli.denoise import load_any_checkpoint

    cfg, params, _ = load_any_checkpoint(args.ckpt)
    return cfg, params


def demo(args) -> None:
    cfg, params = _load(args)
    fl, ts, sr = cfg.frame_length, cfg.total_stride, 16000
    mux = SessionMultiplexer(params, cfg, slots=args.slots, block=args.block,
                             weights=args.weights)
    rng = np.random.default_rng(0)
    n = fl + 40 * mux.tick_samples
    sessions = {}
    outs = {}
    for k in range(args.sessions):
        sid = mux.open()
        sessions[sid] = (rng.normal(size=n) * 0.2).astype(np.float32)
        outs[sid] = []
    # staggered, uneven feeding — sessions join and progress independently
    pos = {sid: 0 for sid in sessions}
    chunk = {sid: (i + 2) * ts for i, sid in enumerate(sessions)}
    t0 = time.perf_counter()
    while any(pos[s] < n for s in sessions):
        for sid, audio in sessions.items():
            if pos[sid] < n:
                nxt = min(pos[sid] + chunk[sid], n)
                outs[sid].append(mux.feed(sid, audio[pos[sid]:nxt]))
                pos[sid] = nxt
    for sid in sessions:
        outs[sid].append(mux.flush(sid))
        mux.close(sid)
    dt = time.perf_counter() - t0
    total = 0
    for sid in sessions:
        y = np.concatenate(outs[sid])
        total += y.shape[0]
        print(f"session {sid}: in {n} samples -> out {y.shape[0]} samples, "
              f"rms {float(np.sqrt(np.mean(y**2))):.4f}")
    print(f"{args.sessions} sessions, {mux.ticks} ticks, "
          f"{total / sr:.1f} audio-s in {dt:.1f} s host-loop wall "
          f"(host-driven loop; --bench for the compute-side number)")


def bench(args) -> None:
    """Aggregate throughput: scan T block-ticks at batch=slots on-device."""
    from cleanumamba_tpu.streaming import (
        prepare_weight_view,
        stream_prime,
        stream_step,
        stream_step_block,
    )

    cfg, params = _load(args)
    fl, ts, sr = cfg.frame_length, cfg.total_stride, 16000
    B, block = args.slots, args.block
    dtype = jnp.bfloat16 if args.weights == "bf16" else jnp.float32
    params, view = prepare_weight_view(params, args.weights, dtype)
    tick = block * ts
    n_ticks = max(1, int(args.seconds * sr) // tick)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(B, fl + n_ticks * tick)).astype(np.float32) * 0.1
    prime = jax.jit(lambda p, f: stream_prime(view(p), cfg, f, dtype))
    state, _ = prime(params, jnp.asarray(audio[:, :fl]))
    ticks = jnp.asarray(
        np.stack([audio[:, fl + t * tick: fl + (t + 1) * tick]
                  for t in range(n_ticks)]))

    step = stream_step if block == 1 else stream_step_block

    @jax.jit
    def run(p, s, b, scale):
        def body(st, blk):
            return step(view(p), cfg, st, blk * scale, dtype)

        st, outs = jax.lax.scan(body, s, b)
        return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

    float(run(params, state, ticks, 1.0))  # compile + warm
    dts = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        float(run(params, state, ticks, 1.0 + 0.001 * (i + 1)))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    audio_s = n_ticks * tick / sr  # per session
    agg = B * audio_s / dt
    print(json.dumps({
        "metric": "serving_throughput",
        "value": round(agg, 1),
        "unit": "audio_seconds_per_second",
        "slots": B,
        "block": block,
        "weights": args.weights,
        "per_session_rtf": round(audio_s / dt, 1),
        "tick_ms": round(dt / n_ticks * 1e3, 3),
        "reps_ms": [round(d * 1e3, 1) for d in dts],
    }))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint path, or 'flagship' for the synthetic-"
                         "init E8 full model (bench.py's geometry)")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--block", type=int, default=1)
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--weights", choices=["fp32", "bf16", "int8"],
                    default="bf16")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--seconds", type=float, default=40.0,
                    help="audio seconds per session per timed rep (bench)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                    help="force a backend (the sandbox's sitecustomize "
                         "ignores JAX_PLATFORMS from the environment)")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.slots < 1 or args.block < 1 or args.sessions < 1:
        ap.error("--slots/--block/--sessions must be >= 1")
    if args.sessions > args.slots:
        ap.error("--sessions cannot exceed --slots")
    (bench if args.bench else demo)(args)


if __name__ == "__main__":
    main()
