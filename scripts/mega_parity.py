"""Mega-kernel parity on the released mamba/mamba2/LSTM checkpoints (full + pruned).

Drives ops/pallas/stream_mega.py frame-for-frame against the XLA
stream_step on the real converted checkpoints.  On CPU the kernel runs in
interpret mode; on the TPU chip it runs compiled (pass --chip).

Usage:  python scripts/mega_parity.py [--chip] [--frames N]
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPTS = [
    "experiments/Experiment_CleanU_Mamba.pkl",
    "experiments/Experiment_CleanU_Mamba2.pkl",
    "experiments/Experiment_CleanU_LSTM.pkl",
    "experiments/Experiment_CleanU_MambaS4.pkl",
    "experiments/Experiment_CleanU_MHA.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-2M.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-1M.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-500K.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-200K.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-2M.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-1M.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-500k.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-200k.pkl",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true",
                    help="run compiled on the TPU (default: CPU interpret)")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--only", default=None,
                    help="substring filter on checkpoint names")
    args = ap.parse_args()

    import jax
    if not args.chip:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.ops.pallas.stream_mega import pack_mega
    from cleanumamba_tpu.streaming import (
        stream_prime,
        stream_step,
        stream_step_mega,
    )

    for name in CKPTS:
        if args.only and args.only not in name:
            continue
        cfg, params, _ = load_reference_checkpoint(
            os.path.join("/root/reference/checkpoints", name))
        mega = pack_mega(params, cfg, jnp.float32)
        dtype_tag = "fp32"
        if mega is None:
            mega = pack_mega(params, cfg, jnp.bfloat16)
            dtype_tag = "bf16"
        if mega is None:
            print(f"{name}: DOES NOT PACK")
            continue
        rng = np.random.default_rng(0)
        fl, ts = cfg.frame_length, cfg.total_stride
        x = (rng.normal(size=(1, fl + args.frames * ts)) * 0.1
             ).astype(np.float32)
        step_ref = jax.jit(lambda s, n, _c=cfg: stream_step(params, _c, s, n))
        step_mega = jax.jit(
            lambda s, n, _c=cfg, _m=mega: stream_step_mega(
                _c, s, n, _m, interpret=not args.chip))
        # prime must run jitted: the S4 cache init does complex math, and
        # eager complex ops are UNIMPLEMENTED on the axon relay
        st_r, _ = jax.jit(lambda f, _c=cfg: stream_prime(params, _c, f))(
            jnp.asarray(x[:, :fl]))
        st_m, worst, scale = st_r, 0.0, 0.0
        for t in range(args.frames):
            new = jnp.asarray(x[:, fl + t * ts: fl + (t + 1) * ts])
            st_r, yr = step_ref(st_r, new)
            st_m, ym = step_mega(st_m, new)
            worst = max(worst, float(jnp.abs(ym - yr).max()))
            scale = max(scale, float(jnp.abs(yr).max()))
        nbytes = sum(a.size * a.dtype.itemsize for a in mega[0])
        print(f"{name}: packs {nbytes/1e6:.2f} MB {dtype_tag}, "
              f"max|d|={worst:.2e} (rel {worst/(scale + 1e-12):.2e})")


if __name__ == "__main__":
    main()
