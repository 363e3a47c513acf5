"""Model-zoo benchmark: every released reference checkpoint on the chip.

For each checkpoint: param count, MACs/s (XLA cost analysis), and on-device
block-16 streaming RTF (bf16 weights, 10 s of audio through lax.scan'd
stream_step_block — the bench.py methodology).  Emits one JSON line per
model; `--doc` rewrites docs/model_zoo.md.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

CKPTS = [
    ("Mamba 442K", "experiments/Experiment_CleanU_Mamba.pkl"),
    ("Mamba2 428K", "experiments/Experiment_CleanU_Mamba2.pkl"),
    ("Mamba-S4 451K", "experiments/Experiment_CleanU_MambaS4.pkl"),
    ("LSTM 443K", "experiments/Experiment_CleanU_LSTM.pkl"),
    ("MHA 443K", "experiments/Experiment_CleanU_MHA.pkl"),
    ("E8 pruned 2M", "pruned/CleanUMamba-3N-E8_pruned-2M.pkl"),
    ("E8 pruned 1M", "pruned/CleanUMamba-3N-E8_pruned-1M.pkl"),
    ("E8 pruned 500K", "pruned/CleanUMamba-3N-E8_pruned-500K.pkl"),
    ("E8 pruned 200K", "pruned/CleanUMamba-3N-E8_pruned-200K.pkl"),
    ("E6 pruned 2M", "pruned/CleanUMamba-3N-E6_pruned-2M.pkl"),
    ("E6 pruned 1M", "pruned/CleanUMamba-3N-E6_pruned-1M.pkl"),
    ("E6 pruned 500K", "pruned/CleanUMamba-3N-E6_pruned-500k.pkl"),
    ("E6 pruned 200K", "pruned/CleanUMamba-3N-E6_pruned-200k.pkl"),
]


def bench_one(name, path):
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.models.cleanumamba import count_params, prepare_for_length
    from cleanumamba_tpu.streaming import stream_prime, stream_step_block
    from cleanumamba_tpu.utils import model_macs, model_macs_torch_convention

    cfg, params, _ = load_reference_checkpoint(path)
    n_params = count_params(params)
    macs_paper = model_macs_torch_convention(params, cfg)
    params = prepare_for_length(params, cfg, 16000)
    macs = model_macs(params, cfg)

    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )
    ts, fl, sr = cfg.total_stride, cfg.frame_length, 16000
    fpb = max(1, 4096 // ts)  # ~reference demo CHUNK=4096 samples per block
    n_frames = (10 * sr) // ts
    n_blocks = n_frames // fpb
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, fl + n_blocks * fpb * ts)).astype(np.float32) * 0.1

    prime = jax.jit(lambda p, f: stream_prime(p, cfg, f, dtype))
    state, _ = prime(params, jnp.asarray(audio[:, :fl]))
    blocks = jnp.asarray(np.stack([
        audio[:, fl + b * fpb * ts: fl + (b + 1) * fpb * ts]
        for b in range(n_blocks)]))

    @jax.jit
    def run(p, s, b, scale):
        def body(st, blk):
            return stream_step_block(p, cfg, st, blk * scale, dtype)

        st, outs = jax.lax.scan(body, s, b)
        return jnp.sum(jnp.abs(outs.astype(jnp.float32)))

    float(run(params, state, blocks, 1.0))
    dts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(run(params, state, blocks, 1.0 + 0.001 * (i + 1)))
        dts.append(time.perf_counter() - t0)
    rtf = (n_blocks * fpb * ts / sr) / min(dts)
    return {
        "model": name,
        "params": int(n_params),
        "macs_per_s": None if macs is None else int(macs),
        "macs_paper_conv": int(macs_paper),
        "stream_rtf_block": round(rtf, 1),
        "frames_per_block": fpb,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference/checkpoints")
    ap.add_argument("--only", default=None)
    ap.add_argument("--doc", default=None, help="write markdown table here")
    args = ap.parse_args()
    rows = []
    for name, rel in CKPTS:
        if args.only and args.only not in name:
            continue
        try:
            row = bench_one(name, os.path.join(args.root, rel))
        except Exception as e:  # noqa: BLE001
            row = {"model": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row), flush=True)
        rows.append(row)
    if args.doc:
        lines = [
            "# Model zoo — released checkpoints on a single v5e chip",
            "",
            "Converted from the reference pickles; streaming RTF is the",
            "on-device block-streaming loop (bf16 weights, ~256 ms blocks,",
            "bench.py methodology).  Two MACs columns: 'XLA' counts the",
            "flops our graph actually executes (cost analysis, scan",
            "included); 'paper conv.' reproduces the published torchprofile",
            "convention — conv-transpose counted on its OUTPUT length (a",
            "stride-factor overcount) and custom ops (CUDA scan, FFT, fused",
            "LSTM) counted zero.  On the 442K Mamba model the paper-",
            "convention column reads 467M vs the published 468M (0.3%);",
            "see utils.model_macs_torch_convention.",
            "",
            "| model | params | MACs/s (XLA) | MACs/s (paper conv.) | streaming RTF |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            if "error" in r:
                lines.append(f"| {r['model']} | — | — | — | ERROR: {r['error']} |")
            else:
                macs = "—" if r["macs_per_s"] is None else f"{r['macs_per_s']/1e6:.0f}M"
                mp = f"{r['macs_paper_conv']/1e6:.0f}M"
                lines.append(
                    f"| {r['model']} | {r['params']:,} | {macs} | {mp} "
                    f"| {r['stream_rtf_block']}x |")
        with open(args.doc, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", args.doc, file=sys.stderr)


if __name__ == "__main__":
    main()
