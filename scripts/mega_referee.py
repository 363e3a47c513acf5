"""Referee the on-chip mega-kernel vs the on-chip XLA step against CPU truth.

scripts/mega_parity.py measures mega-vs-XLA *on the same device*; on the
TPU that difference conflates two causes: (a) the mega kernel's own error
and (b) the XLA step's default-precision TPU matmuls (fp32 operands lower
to bf16-passes unless precision="highest" — the mega kernel's fp32 packs
always use "highest").  This script separates them: the CPU fp32 step is
the ground truth (CPU matmuls are true fp32), and both on-chip paths are
scored against it frame-for-frame on the same input/state stream.

Run on the TPU chip:  python scripts/mega_referee.py [--frames N]
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPTS = [
    "experiments/Experiment_CleanU_Mamba.pkl",
    "experiments/Experiment_CleanU_LSTM.pkl",
    "experiments/Experiment_CleanU_MambaS4.pkl",
    "experiments/Experiment_CleanU_MHA.pkl",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.ops.pallas.stream_mega import pack_mega
    from cleanumamba_tpu.streaming import (
        stream_prime,
        stream_step,
        stream_step_mega,
    )

    cpu = jax.local_devices(backend="cpu")[0]

    for name in CKPTS:
        cfg, params, _ = load_reference_checkpoint(
            os.path.join("/root/reference/checkpoints", name))
        mega = pack_mega(params, cfg, jnp.float32)
        if mega is None:
            print(f"{name}: does not pack fp32, skipping")
            continue
        rng = np.random.default_rng(0)
        fl, ts = cfg.frame_length, cfg.total_stride
        x = (rng.normal(size=(1, fl + args.frames * ts)) * 0.1
             ).astype(np.float32)

        # CPU fp32 ground truth (true-fp32 matmuls)
        with jax.default_device(cpu):
            st_c, _ = stream_prime(params, cfg, jnp.asarray(x[:, :fl]))
            truths = []
            for t in range(args.frames):
                new = jnp.asarray(x[:, fl + t * ts: fl + (t + 1) * ts])
                st_c, yc = stream_step(params, cfg, st_c, new)
                truths.append(np.asarray(yc))

        # on-chip XLA step and mega step, each scored vs truth
        step_ref = jax.jit(lambda s, n, _c=cfg: stream_step(params, _c, s, n))
        step_mega = jax.jit(
            lambda s, n, _c=cfg, _m=mega: stream_step_mega(_c, s, n, _m))
        # jitted: eager complex ops (S4 cache init) are UNIMPLEMENTED on
        # the axon relay
        st_r, _ = jax.jit(lambda f, _c=cfg: stream_prime(params, _c, f))(
            jnp.asarray(x[:, :fl]))
        st_m = st_r
        worst_x, worst_m, scale = 0.0, 0.0, 0.0
        for t in range(args.frames):
            new = jnp.asarray(x[:, fl + t * ts: fl + (t + 1) * ts])
            st_r, yr = step_ref(st_r, new)
            st_m, ym = step_mega(st_m, new)
            worst_x = max(worst_x, float(np.abs(np.asarray(yr) - truths[t]).max()))
            worst_m = max(worst_m, float(np.abs(np.asarray(ym) - truths[t]).max()))
            scale = max(scale, float(np.abs(truths[t]).max()))
        print(f"{name}: vs CPU truth over {args.frames} frames "
              f"(|y|max {scale:.2e}) — chip XLA step {worst_x:.2e}, "
              f"chip mega {worst_m:.2e}")


if __name__ == "__main__":
    main()
