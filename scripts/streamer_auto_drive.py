"""Drive the default Streamer (fused='auto') on the real chip.

Confirms the auto policy end-to-end where it actually matters: on TPU the
default-constructed Streamer must resolve to the whole-frame mega kernel
for the released checkpoints (streaming.py policy, measured fastest + most
accurate path in docs/performance.md), run COMPILED through the host
feed/flush API, and track a fused=False (XLA-step) Streamer fed the same
chunks.  The XLA Streamer is the oracle rather than the offline forward
because the released checkpoints run normalize_input=True, where streaming
(per-frame EMA std) and offline (global std) legitimately differ; the two
Streamers share the exact streaming semantics, so their gap is purely
mega-vs-XLA numerics (bounded by the bf16 passes in the XLA step's
default-precision matmuls — see scripts/mega_referee.py).

Run on the TPU chip:  python scripts/streamer_auto_drive.py
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPTS = [
    "experiments/Experiment_CleanU_Mamba.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-2M.pkl",   # packs fp32 since the
    "pruned/CleanUMamba-3N-E8_pruned-500K.pkl",  # 24 MiB budget
]


def main():
    import jax

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.streaming import Streamer

    on_tpu = jax.default_backend() != "cpu"
    L = 4096
    for name in CKPTS:
        cfg, params, _ = load_reference_checkpoint(
            os.path.join("/root/reference/checkpoints", name))
        x = (np.random.default_rng(0).normal(size=(1, L)) * 0.1
             ).astype(np.float32)

        s_auto = Streamer(params, cfg)  # all defaults — the policy under test
        s_xla = Streamer(params, cfg, fused=False)
        mode = s_auto.fused_mode
        # feed stride-sized chunks: exactly one new frame per feed(), so the
        # single-frame step (the mega/XLA path under test) runs — larger
        # chunks would route BOTH streamers through the shared block path
        ts = cfg.total_stride
        outs_a, outs_x = [], []
        for i in range(0, L, ts):
            outs_a.append(s_auto.feed(x[:, i:i + ts]))
            outs_x.append(s_xla.feed(x[:, i:i + ts]))
        outs_a.append(s_auto.flush())
        outs_x.append(s_xla.flush())
        ya = np.concatenate(outs_a, axis=1)
        yx = np.concatenate(outs_x, axis=1)
        d = float(np.abs(ya - yx).max())
        scale = float(np.abs(yx).max()) + 1e-12
        ok = d / scale < 0.1 if on_tpu else d / scale < 1e-4
        print(f"{name}: fused_mode={mode} | auto-vs-XLA-step "
              f"max|d|={d:.2e} (|y|max {scale:.2e}) -> "
              f"{'OK' if ok else 'FAIL'}")
        if on_tpu and mode != "mega":
            print("  UNEXPECTED: auto should resolve to mega on TPU")
            sys.exit(1)
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
