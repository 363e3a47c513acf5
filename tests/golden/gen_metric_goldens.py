"""Golden-conformance generator for WSS/LLR/segSNR/STOI.

Regenerates tests/golden/metrics_golden.json.  Expected values are
cross-computed from sources INDEPENDENT of cleanumamba_tpu.eval.metrics:

- WSS / LLR / segSNR: the reference repo's own numpy implementations
  (/root/reference/src/util/python_eval.py wss/llr/snr — its pesq/pystoi/tqdm
  imports stubbed), fed the int16 scale its wavfile pipeline produces, and
  aggregated exactly as its eval_waveform does (sorted, best alpha=0.95,
  NaN-trimmed for LLR; python_eval.py:88-105).
- STOI: a second from-paper implementation written here against
  Taal et al. 2011 ("An Algorithm for Intelligibility Prediction of
  Time-Frequency Weighted Noisy Speech"), sharing no code with
  eval/metrics.py.

Run: python tests/golden/gen_metric_goldens.py
(the deterministic `make_pairs` below is also imported by
tests/test_metrics.py to rebuild the same input pairs at test time).
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np

FS = 16000


# ---------------------------------------------------------------------------
# deterministic synthetic pairs
# ---------------------------------------------------------------------------

def _speech_like(seed: int, n: int = 32000) -> np.ndarray:
    """Voiced harmonic stack with pitch wobble, syllabic envelope, and
    unvoiced noise bursts — enough spectro-temporal structure for the
    metrics to behave as they do on speech."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    f0 = 110 + 30 * np.sin(2 * np.pi * 2.3 * t + rng.uniform(0, 2 * np.pi))
    phase = 2 * np.pi * np.cumsum(f0) / FS
    env = 0.4 * (1 + np.sin(2 * np.pi * 3.7 * t + rng.uniform(0, 2 * np.pi)))
    sig = env * sum(
        np.sin(k * phase + rng.uniform(0, 2 * np.pi)) / k for k in range(1, 8)
    )
    burst = (np.sin(2 * np.pi * 1.1 * t + rng.uniform(0, 2 * np.pi)) > 0.6)
    sig = sig + 0.15 * burst * rng.standard_normal(n)
    return (sig / np.max(np.abs(sig)) * 0.5).astype(np.float64)


def _add_noise(sig: np.ndarray, snr_db: float, rng) -> np.ndarray:
    noise = rng.standard_normal(len(sig))
    scale = np.sqrt(np.mean(sig ** 2) / (np.mean(noise ** 2) * 10 ** (snr_db / 10)))
    return sig + scale * noise


def _lowpass(sig: np.ndarray) -> np.ndarray:
    from scipy.signal import firwin, lfilter

    return lfilter(firwin(101, 4000, fs=FS), 1.0, sig)


def make_pairs():
    """[(name, clean, processed)] — six pairs: five SNRs + a low-pass."""
    pairs = []
    for name, seed, snr in [
        ("seed0_snr0", 0, 0), ("seed0_snr10", 0, 10), ("seed1_snr5", 1, 5),
        ("seed2_snr20", 2, 20), ("seed3_snr40", 3, 40),
    ]:
        clean = _speech_like(seed)
        rng = np.random.default_rng(100 + seed * 7 + snr)
        pairs.append((name, clean, _add_noise(clean, snr, rng)))
    clean = _speech_like(4)
    pairs.append(("seed4_lowpass", clean, _lowpass(clean)))
    return pairs


# ---------------------------------------------------------------------------
# oracle 1: the reference's own wss/llr/snr
# ---------------------------------------------------------------------------

def _load_reference_eval():
    for mod, attrs in (("pesq", {"pesq": None}), ("pystoi", {"stoi": None}),
                       ("tqdm", {"tqdm": lambda x, **k: x})):
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[mod] = m
    sys.path.insert(0, "/root/reference/src/util")
    import python_eval

    return python_eval


# ---------------------------------------------------------------------------
# oracle 2: independent STOI (Taal et al. 2011)
# ---------------------------------------------------------------------------

def stoi_independent(clean: np.ndarray, proc: np.ndarray, fs: int = FS) -> float:
    from scipy.signal import resample_poly

    fs_s, N_frame, K, J, mn = 10000, 256, 512, 15, 150
    N, Beta, dyn_range = 30, -15.0, 40
    x = resample_poly(clean, fs_s, fs)
    y = resample_poly(proc, fs_s, fs)

    # silent-frame removal (§2.1): mask frames > max_energy - 40 dB, then
    # reconstruct the kept frames by windowed overlap-add (50% hann OLA
    # sums to unity gain)
    w = np.hanning(N_frame + 2)[1:-1]
    hop = N_frame // 2
    n_fr = (len(x) - N_frame) // hop + 1
    xw = np.array([x[i * hop:i * hop + N_frame] * w for i in range(n_fr)])
    yw = np.array([y[i * hop:i * hop + N_frame] * w for i in range(n_fr)])
    e = 20 * np.log10(np.linalg.norm(xw, axis=1) + 1e-300)
    keep = np.where(e > e.max() - dyn_range)[0]
    xs = np.zeros((len(keep) - 1) * hop + N_frame)
    ys = np.zeros_like(xs)
    for k, i in enumerate(keep):
        xs[k * hop:k * hop + N_frame] += xw[i]
        ys[k * hop:k * hop + N_frame] += yw[i]

    # TF decomposition: hann-windowed rfft, 1/3-octave bands from 150 Hz
    n_fr = (len(xs) - N_frame) // hop + 1
    Xf = np.array([np.fft.rfft(xs[i * hop:i * hop + N_frame] * w, K) for i in range(n_fr)])
    Yf = np.array([np.fft.rfft(ys[i * hop:i * hop + N_frame] * w, K) for i in range(n_fr)])
    f = np.arange(K // 2 + 1) * fs_s / K
    cf = mn * 2.0 ** (np.arange(J) / 3.0)
    lo, hi = cf * 2 ** (-1 / 6), cf * 2 ** (1 / 6)
    H = np.zeros((J, K // 2 + 1))
    for j in range(J):
        # nearest-bin band edges as in the paper's published implementation
        bl = np.argmin((f - lo[j]) ** 2)
        bh = np.argmin((f - hi[j]) ** 2)
        H[j, bl:bh] = 1.0
    Xb = np.sqrt(H @ (np.abs(Xf.T) ** 2))  # (J, frames)
    Yb = np.sqrt(H @ (np.abs(Yf.T) ** 2))

    c = 10 ** (-Beta / 20)
    d = []
    for m in range(N, Xb.shape[1] + 1):
        Xseg, Yseg = Xb[:, m - N:m], Yb[:, m - N:m]
        a = np.sqrt(np.sum(Xseg ** 2, axis=1, keepdims=True)
                    / (np.sum(Yseg ** 2, axis=1, keepdims=True) + 1e-300))
        Yn = np.minimum(Yseg * a, (1 + c) * Xseg)
        xn = Xseg - Xseg.mean(axis=1, keepdims=True)
        yn = Yn - Yn.mean(axis=1, keepdims=True)
        xn /= np.linalg.norm(xn, axis=1, keepdims=True) + 1e-300
        yn /= np.linalg.norm(yn, axis=1, keepdims=True) + 1e-300
        d.append(np.mean(np.sum(xn * yn, axis=1)))
    return float(np.mean(d))


# ---------------------------------------------------------------------------
# golden computation (aggregation mirrors python_eval.eval_waveform:88-105)
# ---------------------------------------------------------------------------

def compute_goldens():
    pe = _load_reference_eval()
    alpha = 0.95
    out = {"fs": FS, "pairs": {}}
    for name, clean, proc in make_pairs():
        c16, p16 = clean * 32768.0, proc * 32768.0
        wv = np.sort(pe.wss(c16, p16, FS))
        wss_d = float(np.mean(wv[: round(wv.size * alpha)]))
        lv = np.sort(pe.llr(c16, p16, FS))[: round(np.size(pe.llr(c16, p16, FS)) * alpha)]
        lv = lv[~np.isnan(lv)]
        _, seg = pe.snr(c16, p16, FS)
        out["pairs"][name] = {
            "wss": wss_d,
            "llr": float(np.mean(lv)),
            "segsnr": float(np.mean(seg)),
            "stoi": stoi_independent(clean, proc),
        }
    return out


if __name__ == "__main__":
    goldens = compute_goldens()
    path = os.path.join(os.path.dirname(__file__), "metrics_golden.json")
    with open(path, "w") as fh:
        json.dump(goldens, fh, indent=1)
    print(json.dumps(goldens, indent=1))
