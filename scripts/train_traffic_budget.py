"""Per-buffer HBM traffic budget for the E8 train step (round-5 verdict #5).

The training step sits at ~29 ms / ~90% HBM SOL (docs/performance.md).  The
verdict asks: spend the remaining traffic or prove the floor.  This script
produces the evidence either way, at the current rev, on the real chip:

1. measured: XLA cost analysis (flops, bytes accessed) + wall time of the
   jitted train step, pipelined 10 steps per sync (axon RTT rule);
2. analytic: an enumeration of every logical tensor class the step moves
   through HBM — waveform/encoder/decoder activations, bottleneck scan
   IO + saved residuals, loss framing, master params + Adam state — with
   its dtype and an estimated fwd+bwd access count, so the measured total
   can be attributed and the remaining fp32 traffic bounded.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/train_traffic_budget.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, OptimizationConfig
from cleanumamba_tpu.models.cleanumamba import count_params, init_params
from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step

B, L = 2, 160_000


def analytic_budget(cfg: CleanUMambaConfig, n_params: int):
    """Enumerate the big logical tensors, bytes = B*shape*dtype.

    Access counts (reads+writes over fwd+bwd) are the minimum a
    remat-free autodiff schedule needs: activation produced (1 write) +
    consumed by next layer (1 read) + re-read in backward (1 read) +
    its gradient written and read (2) ~= 5 accesses; we use 4 for
    conv activations (XLA fuses producer->consumer pairs) and count the
    scan residuals / params exactly.  This is a budget, not a proof —
    its job is to show which dtype classes the measured total lives in.
    """
    rows = []
    bf2, f4 = 2, 4  # bytes: bf16 activations, fp32

    # encoder/decoder activations per level: (B, H_l, L_l), bf16 both ways.
    H, Lx = cfg.channels_H, L
    act_bytes = 0
    # level-0 input + output waveform, fp32 at the boundary
    rows.append(("waveform in/out + loss grads (fp32)", 6 * B * L * f4))
    for i in range(cfg.encoder_n_layers):
        Lx = -(-Lx // cfg.stride)  # ceil: the model right-pads to stride
        # conv1 output has 2*H channels pre-GLU; count post-GLU H (fused)
        act_bytes += B * H * Lx * bf2
        H = min(H * 2, cfg.max_H)
    # encoder stack + mirrored decoder + skip connections, fwd+bwd ~4 accesses
    rows.append(("encoder+decoder activations x4 (bf16, incl. skips)",
                 4 * 2 * act_bytes))

    # bottleneck: L_b frames of d_model, scan IO at d_inner
    L_b = L // (cfg.stride ** cfg.encoder_n_layers)
    d_model, d_inner = cfg.tsfm_d_model, cfg.d_inner
    d_state = cfg.d_state
    n_layers = cfg.tsfm_n_layers
    scan_io = n_layers * B * L_b * d_inner * bf2  # u per layer (dt same size)
    rows.append(("bottleneck scan IO u,dt,y x fwd+bwd (bf16)", 8 * scan_io))
    rows.append(("bottleneck B,C coeffs (bf16)", 8 * n_layers * B * L_b * d_state * bf2))
    from cleanumamba_tpu.ops.pallas.selective_scan import _VJP_CHUNK
    n_chunks = -(-L_b // _VJP_CHUNK)
    rows.append(("scan saved boundary states (fp32)",
                 2 * n_layers * B * n_chunks * d_state * d_inner * f4))
    rows.append(("bottleneck in-proj/out-proj activations x4 (bf16)",
                 4 * n_layers * B * L_b * (d_model + 2 * d_inner) * bf2))

    # loss: 3-resolution STFT framing of denoised+clean, fwd+bwd
    stft = 0
    for hop, win, nfft in ((50, 240, 512), (120, 600, 1024), (240, 1200, 2048)):
        n_fr = L // hop
        stft += 2 * B * n_fr * (win + nfft) * f4  # frames + spectra, x2 signals
    rows.append(("multi-res STFT frames+spectra x fwd+bwd (fp32)", 2 * stft))

    # parameters: bf16 cast read + fp32 master read/write + grads + Adam m,v
    rows.append(("params: bf16 cast + fp32 master/grads/Adam (read+write)",
                 n_params * (bf2 + 7 * f4)))
    return rows


def main():
    cfg = CleanUMambaConfig()  # E8 full
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = count_params(params)
    optimizer = make_optimizer(OptimizationConfig(n_iters=10_000),
                               schedule=lambda s: 1e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, LossConfig(), optimizer, bf16=True),
                   donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.normal(size=(1, B, L)).astype(np.float32) * 0.3)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(1, B, L)).astype(np.float32))

    lowered = step.lower(params, opt_state, (clean, noisy))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"cost analysis: {flops/1e12:.3f} TFLOP, "
          f"{bytes_acc/2**30:.2f} GiB accessed", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"memory: temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
              f"args {ma.argument_size_in_bytes/2**30:.2f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001 - analysis is optional on some backends
        print("memory_analysis unavailable:", e)

    # timed, pipelined (one scalar sync per 10 steps; axon RTT rule)
    p, o = params, opt_state
    for _ in range(3):
        p, o, aux = compiled(p, o, (clean, noisy))
    _ = float(aux["loss"])
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        p, o, aux = compiled(p, o, (clean, noisy))
    _ = float(aux["loss"])
    ms = (time.perf_counter() - t0) / N * 1e3
    eff_bw = bytes_acc / (ms / 1e3) / 1e9
    print(f"measured: {ms:.1f} ms/step -> effective {eff_bw:.0f} GB/s "
          f"({eff_bw/819*100:.0f}% of 819 GB/s v5e peak)", flush=True)

    rows = analytic_budget(cfg, n_params)
    tot = sum(b for _, b in rows)
    print("\nanalytic budget (logical tensor classes, fwd+bwd):")
    for name, b in sorted(rows, key=lambda r: -r[1]):
        print(f"  {b/2**30:7.2f} GiB  {100*b/bytes_acc:5.1f}% of measured  {name}")
    print(f"  {tot/2**30:7.2f} GiB total analytic vs {bytes_acc/2**30:.2f} GiB measured "
          f"({100*tot/bytes_acc:.0f}% attributed)")
    fp32 = sum(b for n, b in rows if "fp32" in n)
    print(f"\nfp32 share of the analytic budget: {fp32/2**30:.2f} GiB "
          f"({100*fp32/tot:.0f}%) — the ceiling on any further dtype win.")


if __name__ == "__main__":
    main()
