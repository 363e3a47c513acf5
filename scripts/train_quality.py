"""Quality of the from-scratch-trained checkpoint vs its noisy input.

exp/DNS-CleanUMamba-FullMiniMamba-3 is a 2000-step from-scratch training
run of the released 442K geometry (cli/train.py, synthetic clean+noise
material).  This script closes the training-stack evidence loop: the
trained network must IMPROVE the eval metrics over the unprocessed noisy
input on held-out synthetic utterances — i.e. init + schedule + losses +
optimizer actually produce a denoiser, not just a falling loss curve.

Run on the TPU chip:  python scripts/train_quality.py
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUN = os.path.join(REPO, "exp", "DNS-CleanUMamba-FullMiniMamba-3")
FS, N_UTTS = 16000, 8


def main():
    import jax.numpy as jnp

    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.data.dataset import SyntheticDenoiseDataset
    from cleanumamba_tpu.eval.metrics import eval_waveform
    from cleanumamba_tpu.models.cleanumamba import forward
    from cleanumamba_tpu.train.checkpoint import load_latest

    ck = load_latest(os.path.join(RUN, "checkpoint"))
    params, cfg = ck["params"], ck["config"]
    assert isinstance(cfg, CleanUMambaConfig)

    # held-out items from the SAME distribution the run trained on
    # (SyntheticDenoiseDataset; cli/train.py --synthetic) under a disjoint
    # seed, 4 s crops
    ds = SyntheticDenoiseDataset(n_items=N_UTTS, crop_length_sec=4.0,
                                 seed=7777)
    agg = {"noisy": [], "denoised": []}
    for u in range(N_UTTS):
        clean, noisy = ds[u]
        y = np.asarray(forward(params, jnp.asarray(noisy[None]), cfg))[0]
        agg["noisy"].append(eval_waveform(clean, noisy, FS))
        agg["denoised"].append(eval_waveform(clean, y, FS))

    def mean(rows):
        keys = rows[0].keys()
        return {k: round(float(np.mean([r[k] for r in rows])), 4) for k in keys}

    out = {k: mean(v) for k, v in agg.items()}
    out["delta"] = {k: round(out["denoised"][k] - out["noisy"][k], 4)
                    for k in out["noisy"]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
