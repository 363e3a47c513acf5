"""Perceptual evaluation of speech quality — ITU-T P.862 (narrow-band) and
P.862.2 (wide-band extension), implemented from the published recommendation
and Rix et al., "Perceptual evaluation of speech quality (PESQ)", ICASSP 2001.

Replaces the reference's binary ``pesq`` C library dependency
(/root/reference/src/util/python_eval.py:22,108-123) — that library is not
available here, and the framework's own quality gate (BASELINE PESQ) needs
the metric, so this is a from-scratch numpy implementation of the pipeline:

1.  level alignment of both signals to the standard listening level
    (active band power -> 1e7 internal units ~= 79 dB SPL),
2.  input filtering (full-IRS receive characteristic for narrow-band;
    the P.862.2 flat-above-200-Hz high-pass for wide-band),
3.  time alignment (coarse log-energy-envelope correlation + fine
    compressed-envelope correlation at sample resolution),
4.  auditory transform: 32 ms Hann frames, 50 % overlap, warped onto a
    uniform Bark axis (49 bands at 16 kHz, 42 at 8 kHz),
5.  partial compensation of linear filtering (per-band spectra equalised
    over speech-active frames, bounded +/-20 dB) and of short-term gain
    (first-order-smoothed frame gain, bounded [3e-4, 5]),
6.  Zwicker-law loudness mapping against the Terhardt absolute hearing
    threshold,
7.  disturbance processing: per-band deadzone of 0.25*min(loudness),
    asymmetry factor ((deg+50)/(ref+50))^1.2 gated at 3 and capped at 12,
    L2/L1 band aggregation, silent-frame emphasis weighting
    ((audible power + 1e5)/1e7)^0.04, L6-over-syllables / L2-over-time
    aggregation,
8.  raw score 4.5 - 0.1*d_sym - 0.0309*d_asym mapped to MOS-LQO with the
    published logistic (P.862.1 for NB, P.862.2 for WB).

Deviations from strict ITU conformance, documented for honesty: the Bark
bands are generated from the Zwicker frequency-warping formula (uniform in
Bark) rather than the recommendation's tabulated band lists, internal level
calibration is derived first-principles from the 79 dB SPL convention, and
time alignment assumes a constant delay (speech-enhancement outputs are
sample-synchronous; the per-utterance delay-splitting machinery targets
time-varying VoIP channels).  Conformance is therefore validated by
property tests — identity scores, SNR monotonicity, level/delay invariance
— rather than ITU test vectors (see tests/test_pesq.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

# --------------------------------------------------------------------------
# constants
# --------------------------------------------------------------------------

_TARGET_POWER = 1e7        # internal power of level-aligned speech (~79 dB SPL)
_DB_SPL_OF_TARGET = 79.0   # listening level the target power represents
_ZWICKER_POWER = 0.23
_SL = 0.1866               # loudness scaling (sone calibration)

# full-IRS receive characteristic (piecewise-linear dB gain vs Hz), the
# narrow-band input filter of P.862
_IRS_RECEIVE_DB = np.array([
    [0, -200.0], [50, -40.0], [100, -20.0], [125, -12.0], [160, -6.0],
    [200, 0.0], [250, 4.0], [300, 6.0], [350, 8.0], [400, 10.0],
    [500, 11.0], [600, 12.0], [700, 12.0], [800, 12.0], [1000, 12.0],
    [1300, 12.0], [1600, 12.0], [2000, 12.0], [2500, 12.0], [3000, 12.0],
    [3250, 12.0], [3500, 4.0], [4000, -200.0], [8000, -200.0],
])

# P.862.2 wide-band input characteristic: flat above 200 Hz, 3 dB down at
# 140 Hz, high-pass below
_WB_INPUT_DB = np.array([
    [0, -500.0], [50, -75.0], [100, -20.0], [140, -3.0], [200, 0.0],
    [8000, 0.0],
])

# band used for level alignment (active speech band)
_LEVEL_BAND = (350.0, 3250.0)

# disturbance-aggregate calibration.  The Bark bands here are generated from
# the Zwicker warping rather than the recommendation's tables, so the raw
# aggregates live on a slightly different scale than the ITU reference
# implementation's; they are mapped onto the published raw-score scale by a
# one-time power-law calibration (scale + exponent per channel, plus the
# reference-frame-power emphasis exponent) fitted against two published
# characterisation families: MNRU speech-correlated noise at Q dB
# (narrow-band) and additive white noise at fixed SNRs (wide-band).
# exp/calibrate_pesq.py reproduces these numbers (mean |MOS err| 0.15,
# max 0.24 over the 13 anchor conditions).
_C_SYM = 1.158559
_E_SYM = 0.799426
_C_ASYM = 1.267993
_E_ASYM = 0.738143
_H_WEIGHT = 0.186615


# --------------------------------------------------------------------------
# signal-domain preprocessing
# --------------------------------------------------------------------------

def _fft_filter(x: np.ndarray, fs: int, curve_db: np.ndarray) -> np.ndarray:
    """Apply a piecewise-linear (in frequency) dB gain curve via one big FFT."""
    n = len(x)
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    gain_db = np.interp(freqs, curve_db[:, 0], curve_db[:, 1],
                        left=curve_db[0, 1], right=curve_db[-1, 1])
    X = np.fft.rfft(x)
    X *= 10.0 ** (gain_db / 20.0)
    return np.fft.irfft(X, n)


def _band_power(x: np.ndarray, fs: int, lo: float, hi: float) -> float:
    n = len(x)
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    X = np.fft.rfft(x)
    mask = (freqs >= lo) & (freqs <= hi)
    # Parseval: mean power of the band-limited signal
    scale = np.ones_like(freqs)
    scale[1:] = 2.0
    if n % 2 == 0:
        scale[-1] = 1.0
    return float(np.sum(scale[mask] * np.abs(X[mask]) ** 2) / (n * n))


def _fix_level(x: np.ndarray, fs: int) -> np.ndarray:
    """Scale to the standard listening level: active-band power -> 1e7."""
    p = _band_power(x, fs, *_LEVEL_BAND)
    if p <= 0:
        return x
    return x * math.sqrt(_TARGET_POWER / p)


def _estimate_delay(ref: np.ndarray, deg: np.ndarray, fs: int) -> int:
    """Constant delay of ``deg`` relative to ``ref`` in samples (positive =
    deg lags).  Coarse log-energy-envelope correlation at 4 ms resolution,
    refined by sample-resolution correlation of magnitude-compressed
    envelopes (|x|^0.125, the compression the alignment stage of P.862
    applies to be robust against phase distortion)."""
    frame = max(1, fs // 250)  # 4 ms
    n = min(len(ref), len(deg))
    max_lag_f = max(1, (n // frame) // 4)

    def env(x):
        m = (len(x) // frame) * frame
        e = np.sum(x[:m].reshape(-1, frame) ** 2, axis=1)
        return np.log1p(e)

    er, ed = env(ref[:n]), env(deg[:n])
    er = er - er.mean()
    ed = ed - ed.mean()
    m = min(len(er), len(ed))
    nfft = 1 << int(np.ceil(np.log2(2 * m)))
    c = np.fft.irfft(np.fft.rfft(ed, nfft) * np.conj(np.fft.rfft(er, nfft)), nfft)
    lags = np.concatenate([np.arange(0, max_lag_f + 1), np.arange(-max_lag_f, 0)])
    vals = np.concatenate([c[: max_lag_f + 1], c[-max_lag_f:]])
    coarse = int(lags[np.argmax(vals)]) * frame

    # fine: +/- 2 frames around the coarse estimate on compressed envelopes
    w = 2 * frame
    cr = np.abs(ref[:n]) ** 0.125
    cd = np.abs(deg[:n]) ** 0.125
    cr = cr - cr.mean()
    cd = cd - cd.mean()
    best, best_v = coarse, -np.inf
    for lag in range(coarse - w, coarse + w + 1):
        if lag >= 0:
            a, b = cr[: n - lag], cd[lag:n]
        else:
            a, b = cr[-lag:n], cd[: n + lag]
        if len(a) < frame:
            continue
        v = float(np.dot(a, b)) / math.sqrt(
            float(np.dot(a, a)) * float(np.dot(b, b)) + 1e-12)
        if v > best_v:
            best, best_v = lag, v
    return best


def _align(ref: np.ndarray, deg: np.ndarray, fs: int) -> Tuple[np.ndarray, np.ndarray]:
    d = _estimate_delay(ref, deg, fs)
    if d > 0:
        deg = deg[d:]
    elif d < 0:
        ref = ref[-d:]
    n = min(len(ref), len(deg))
    return ref[:n], deg[:n]


# --------------------------------------------------------------------------
# auditory transform
# --------------------------------------------------------------------------

def _bark(f):
    f = np.asarray(f, float)
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def _bark_bands(fs: int, n_fft: int, n_bands: int):
    """Uniform-Bark band edges -> per-bin band index, band centers (Hz) and
    Bark widths."""
    freqs = np.fft.rfftfreq(n_fft, 1.0 / fs)
    z = _bark(freqs)
    z_max = _bark(fs / 2.0)
    edges = np.linspace(0.0, z_max, n_bands + 1)
    idx = np.clip(np.searchsorted(edges, z, side="right") - 1, 0, n_bands - 1)
    centers = np.zeros(n_bands)
    # numerically invert the warping for band-center frequencies
    fine_f = np.linspace(0.0, fs / 2.0, 4096)
    fine_z = _bark(fine_f)
    mid = 0.5 * (edges[:-1] + edges[1:])
    centers = np.interp(mid, fine_z, fine_f)
    widths = np.diff(edges)  # uniform
    return idx, centers, widths


def _abs_threshold_power(centers_hz: np.ndarray) -> np.ndarray:
    """Terhardt absolute hearing threshold per band, converted to internal
    power units (0 dB SPL == _TARGET_POWER / 10^(_DB_SPL_OF_TARGET/10))."""
    f_khz = np.maximum(centers_hz, 10.0) / 1000.0
    thr_db_spl = (3.64 * f_khz ** -0.8
                  - 6.5 * np.exp(-0.6 * (f_khz - 3.3) ** 2)
                  + 1e-3 * f_khz ** 4)
    thr_db_spl = np.clip(thr_db_spl, -10.0, 120.0)
    p0 = _TARGET_POWER / 10.0 ** (_DB_SPL_OF_TARGET / 10.0)
    return p0 * 10.0 ** (thr_db_spl / 10.0)


def _pitch_power_density(x: np.ndarray, fs: int, n_fft: int, band_idx,
                         n_bands: int) -> np.ndarray:
    """(frames, bands) power densities: Hann frames, 50% overlap, band-summed
    power normalised so the band total approximates the frame mean power."""
    hop = n_fft // 2
    n_frames = max(0, (len(x) - n_fft) // hop + 1)
    w = np.hanning(n_fft)
    wnorm = np.sum(w ** 2)
    out = np.zeros((n_frames, n_bands))
    if n_frames == 0:
        return out
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * w
    X = np.fft.rfft(frames, axis=1)
    p = np.abs(X) ** 2
    p[:, 1:] *= 2.0
    if n_fft % 2 == 0:
        p[:, -1] /= 2.0
    p /= (n_fft * wnorm)
    for b in range(n_bands):
        sel = band_idx == b
        if np.any(sel):
            out[:, b] = p[:, sel].sum(axis=1)
    return out


def _total_audible(pp: np.ndarray, thresh: np.ndarray, factor: float) -> np.ndarray:
    """Per-frame total power of bands exceeding factor*threshold."""
    audible = pp * (pp > thresh[None, :] * factor)
    return audible.sum(axis=1)


def _loudness(pp: np.ndarray, thresh: np.ndarray) -> np.ndarray:
    """Zwicker-law specific loudness (sone/Bark) per frame/band."""
    t = thresh[None, :]
    g = _ZWICKER_POWER
    l = _SL * (t / 0.5) ** g * ((0.5 + 0.5 * pp / t) ** g - 1.0)
    return np.maximum(l, 0.0)


# --------------------------------------------------------------------------
# disturbance model
# --------------------------------------------------------------------------

def _lp_bands(d: np.ndarray, widths: np.ndarray, p: float) -> np.ndarray:
    """Band-width-weighted pseudo-Lp norm over the Bark axis, per frame:
    (sum_b (|d_b| * w_b)^p)^(1/p) with w_b the Bark band widths."""
    return np.sum((np.abs(d) * widths[None, :]) ** p, axis=1) ** (1.0 / p)


def _lp_time(v: np.ndarray, p: float) -> float:
    return float(np.mean(np.abs(v) ** p) ** (1.0 / p)) if len(v) else 0.0


def _syllable_aggregate(frame_d: np.ndarray, win: int = 20, hop: int = 10,
                        p_syl: float = 6.0, p_time: float = 2.0) -> float:
    """L6 over split-second (20-frame) intervals, then L2 over time."""
    n = len(frame_d)
    if n == 0:
        return 0.0
    sylls = []
    for s in range(0, max(1, n - win + 1), hop):
        sylls.append(_lp_time(frame_d[s: s + win], p_syl))
    if n < win:
        sylls = [_lp_time(frame_d, p_syl)]
    return _lp_time(np.asarray(sylls), p_time)


def _psychoacoustic_model(ref: np.ndarray, deg: np.ndarray, fs: int,
                          n_fft: int, n_bands: int,
                          return_frames: bool = False):
    band_idx, centers, widths = _bark_bands(fs, n_fft, n_bands)
    thresh = _abs_threshold_power(centers)

    ppr = _pitch_power_density(ref, fs, n_fft, band_idx, n_bands)
    ppd = _pitch_power_density(deg, fs, n_fft, band_idx, n_bands)
    n_frames = min(len(ppr), len(ppd))
    if n_frames == 0:
        return 0.0, 0.0
    ppr, ppd = ppr[:n_frames], ppd[:n_frames]

    # --- partial compensation of linear filtering (applied to the
    # reference so a time-invariant spectral tilt is not penalised)
    active = _total_audible(ppr, thresh, 100.0) > _TARGET_POWER
    if np.any(active):
        avg_r = ppr[active].mean(axis=0)
        avg_d = ppd[active].mean(axis=0)
    else:
        avg_r = ppr.mean(axis=0)
        avg_d = ppd.mean(axis=0)
    comp = (avg_d + 1000.0) / (avg_r + 1000.0)
    comp = np.clip(comp, 0.01, 100.0)  # +/- 20 dB
    ppr_eq = ppr * comp[None, :]

    # --- partial compensation of short-term gain (first-order smoothed,
    # bounded, applied to the equalised reference)
    aud_r = _total_audible(ppr_eq, thresh, 1.0)
    aud_d = _total_audible(ppd, thresh, 1.0)
    gain = (aud_d + 5e3) / (aud_r + 5e3)
    scale = np.empty(n_frames)
    prev = gain[0]
    for t in range(n_frames):
        s = gain[t] if t == 0 else 0.2 * prev + 0.8 * gain[t]
        prev = s
        scale[t] = min(max(s, 3e-4), 5.0)
    ppr_c = ppr_eq * scale[:, None]

    # --- loudness and raw disturbance with deadzone
    lr = _loudness(ppr_c, thresh)
    ld = _loudness(ppd, thresh)
    d = ld - lr
    m = 0.25 * np.minimum(ld, lr)
    d = np.sign(d) * np.maximum(np.abs(d) - m, 0.0)

    # --- asymmetry factor: additive distortions are more annoying than
    # attenuations
    ratio = ((ppd + 50.0) / (ppr_c + 50.0)) ** 1.2
    asym = np.where(ratio < 3.0, 0.0, np.minimum(ratio, 12.0))
    da = d * asym

    # --- per-frame aggregation over bands + silent-frame emphasis
    d_frame = _lp_bands(d, widths, 2.0)
    da_frame = _lp_bands(da, widths, 1.0)
    # heavy-disturbance cap on the symmetric channel
    d_frame = np.minimum(d_frame, 45.0)
    # reference-frame-power emphasis: w < 1 on silent frames, so a positive
    # exponent de-emphasises disturbance during silence and a negative one
    # emphasises it (calibrated, see module docstring)
    w = (_total_audible(ppr_c, thresh, 1.0) + 1e5) / _TARGET_POWER
    if return_frames:  # pre-weight frame vectors, for calibration fitting
        return d_frame, da_frame, w
    d_frame = d_frame * w ** _H_WEIGHT
    da_frame = da_frame * w ** _H_WEIGHT

    d_sym = _C_SYM * _syllable_aggregate(d_frame) ** _E_SYM
    d_asym = _C_ASYM * _syllable_aggregate(da_frame) ** _E_ASYM
    return d_sym, d_asym


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def pesq_p862(fs: int, ref: np.ndarray, deg: np.ndarray, mode: str = "wb") -> float:
    """MOS-LQO per P.862 ('nb') / P.862.2 ('wb').  API-compatible with the
    ``pesq`` package's ``pesq(fs, ref, deg, mode)`` (reference
    python_eval.py:108,124)."""
    if mode not in ("wb", "nb"):
        raise ValueError(f"mode must be 'wb' or 'nb', got {mode!r}")
    if fs not in (8000, 16000):
        raise ValueError(f"fs must be 8000 or 16000, got {fs}")
    if mode == "wb" and fs == 8000:
        raise ValueError("wide-band PESQ requires fs=16000")
    ref = np.asarray(ref, np.float64).reshape(-1)
    deg = np.asarray(deg, np.float64).reshape(-1)
    if min(len(ref), len(deg)) < fs // 4:
        raise ValueError("signals too short for PESQ (< 0.25 s)")

    curve = _IRS_RECEIVE_DB if mode == "nb" else _WB_INPUT_DB
    ref_f = _fft_filter(ref, fs, curve)
    deg_f = _fft_filter(deg, fs, curve)

    # level alignment after input filtering so the filter's passband gain
    # does not shift the internal scale the model's constants assume
    ref_f = _fix_level(ref_f, fs)
    deg_f = _fix_level(deg_f, fs)

    ref_f, deg_f = _align(ref_f, deg_f, fs)

    n_fft = 512 if fs == 16000 else 256    # 32 ms
    n_bands = 49 if fs == 16000 else 42
    d_sym, d_asym = _psychoacoustic_model(ref_f, deg_f, fs, n_fft, n_bands)

    raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asym
    raw = min(max(raw, -0.5), 4.5)
    if mode == "nb":
        # P.862.1 mapping
        return 0.999 + 4.0 / (1.0 + math.exp(-1.4945 * raw + 4.6607))
    # P.862.2 mapping
    return 0.999 + 4.0 / (1.0 + math.exp(-1.3669 * raw + 3.8224))
