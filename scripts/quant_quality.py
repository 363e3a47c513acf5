"""int8 streaming quality delta on real released checkpoints (VERDICT weak #5).

The 136x-realtime single-stream latency headline rides on weight-only int8
(quant.py, Streamer(weights="int8")); round 2 bounded its error only by a
waveform-tracking test on a tiny random-weight model.  This script measures
what actually matters: ΔPESQ/ΔSTOI between fp32 and int8 streaming on
released checkpoints over the synthetic noisy-speech bank
(eval/synth.py), and records the result in docs/performance.md's int8
section.

Run on the TPU chip:  python scripts/quant_quality.py
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPTS = [
    ("Mamba 442K", "experiments/Experiment_CleanU_Mamba.pkl"),
    ("E8 pruned 500K", "pruned/CleanUMamba-3N-E8_pruned-500K.pkl"),
]
SECONDS = 4.0
FS = 16000
N_UTTS = 4
SNRS = (5.0, 10.0, 15.0)


def main():
    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.eval.metrics import eval_waveform
    from cleanumamba_tpu.eval.synth import add_noise, speech_like
    from cleanumamba_tpu.streaming import Streamer

    cleans = [speech_like(200 + u, SECONDS, FS) for u in range(N_UTTS)]
    conds = [(u, snr) for u in range(N_UTTS) for snr in SNRS]
    noisy = np.stack([add_noise(cleans[u], snr, seed=900 + 13 * u, kind="white")
                      for u, snr in conds]).astype(np.float32)

    for name, rel in CKPTS:
        cfg, params, _ = load_reference_checkpoint(
            os.path.join("/root/reference/checkpoints", rel))
        rows = {}
        for weights in ("fp32", "int8"):
            s = Streamer(params, cfg, batch=noisy.shape[0], weights=weights)
            out = np.concatenate([s.feed(noisy), s.flush()], axis=1)
            out = out[:, : noisy.shape[1]]
            acc = {"pesq_wb": [], "pesq_nb": [], "stoi": [], "si_sdr": []}
            for i, (u, snr) in enumerate(conds):
                r = eval_waveform(cleans[u], out[i], FS)
                for k in acc:
                    if r.get(k) is not None:
                        acc[k].append(r[k])
            rows[weights] = {k: round(float(np.mean(v)), 4) for k, v in acc.items()}
        delta = {k: round(rows["int8"][k] - rows["fp32"][k], 4)
                 for k in rows["fp32"]}
        print(json.dumps({"model": name, "fp32": rows["fp32"],
                          "int8": rows["int8"], "delta": delta}), flush=True)


if __name__ == "__main__":
    main()
