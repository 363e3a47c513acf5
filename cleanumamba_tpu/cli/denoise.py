"""Bulk denoising CLI (reference src/examples/denoise.py:14-90 +
loading_pretrained_models.py): folder of noisy wavs in, ``enhanced_*.wav``
out.  Loads either our checkpoints or the reference's PyTorch pickles."""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu.data.dataset import NoisyOnlyDataset
from cleanumamba_tpu.data.wavio import write_wav
from cleanumamba_tpu.models.cleanumamba import forward, prepare_for_length


def load_any_checkpoint(path: str):
    """Load a checkpoint: ours (train.checkpoint format) or a reference
    torch pickle (detected by content)."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head[:2] == b"PK" or head.startswith(b"\x80"):
        # torch zip-archive or raw pickle -> try the reference converter
        try:
            from cleanumamba_tpu.convert import load_reference_checkpoint

            return load_reference_checkpoint(path)
        except Exception:
            pass
    from cleanumamba_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(path)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, ck["params"]
    )
    return ck["config"], params, ck


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--input", required=True, help="folder of noisy .wav files")
    ap.add_argument("--output", required=True, help="output folder")
    ap.add_argument("--sample-rate", type=int, default=16000)
    ap.add_argument("--pad-to-sec", type=float, default=None,
                    help="pad/crop to fixed length to avoid per-length recompiles")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 weights+activations (~1.3x faster offline; "
                         "normalization/scan state stay fp32)")
    args = ap.parse_args(argv)

    cfg, params, meta = load_any_checkpoint(args.ckpt)
    if args.bf16:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
            params,
        )
    ds = NoisyOnlyDataset(args.input, args.sample_rate)
    os.makedirs(args.output, exist_ok=True)
    in_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    fwd = jax.jit(
        lambda p, x: forward(p, x.astype(in_dtype), cfg).astype(jnp.float32)
    )

    total_audio, total_time = 0.0, 0.0
    for i in range(len(ds)):
        noisy, path = ds[i]
        L = len(noisy)
        x = noisy
        if args.pad_to_sec:
            target = int(args.pad_to_sec * args.sample_rate)
            x = np.pad(noisy, (0, max(0, target - L)))[:target]
        params = prepare_for_length(params, cfg, len(x))
        t0 = time.perf_counter()
        den = np.asarray(fwd(params, jnp.asarray(x[None], jnp.float32)))[0][:L]
        dt = time.perf_counter() - t0
        total_audio += L / args.sample_rate
        total_time += dt
        out_path = os.path.join(args.output, "enhanced_" + os.path.basename(path))
        write_wav(out_path, den, args.sample_rate)
        print(f"[{i+1}/{len(ds)}] {os.path.basename(path)} "
              f"({L/args.sample_rate:.1f}s in {dt*1e3:.0f}ms)")
    if total_time:
        print(f"offline throughput: {total_audio/total_time:.1f}x realtime "
              f"(incl. first-call compile)")


if __name__ == "__main__":
    main()
