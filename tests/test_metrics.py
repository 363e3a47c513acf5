"""Metric sanity + consistency tests.

Without pesq/pystoi in the image, correctness is established by algebraic
properties: perfect reconstruction scores, monotonicity in noise level, LPC
vs direct Toeplitz solve, and (when available) cross-checks vs pystoi."""

import numpy as np
import pytest

from cleanumamba_tpu.eval.metrics import (
    _lpc,
    _quad_toeplitz,
    eval_waveform,
    llr,
    segmental_snr,
    si_sdr,
    stoi,
    wss,
)


def _speech_like(n=32000, seed=0, fs=16000):
    """Broadband 'speech': amplitude-modulated pink-ish noise + harmonics.

    Needs energy in every third-octave band, otherwise STOI's band
    correlations are dominated by the probe noise in empty bands."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    # pink-ish broadband carrier
    white = rng.normal(size=n)
    spec = np.fft.rfft(white)
    freqs = np.fft.rfftfreq(n, 1 / fs)
    spec[1:] /= np.sqrt(freqs[1:] / 100.0 + 1.0)
    carrier = np.fft.irfft(spec, n)
    # syllabic (4 Hz) + faster envelope modulation
    env = (0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t)) * (
        0.7 + 0.3 * np.sin(2 * np.pi * 11.0 * t + 1.0)
    )
    x = carrier * env
    for f0 in (120, 240):
        x += 0.5 * np.sin(2 * np.pi * f0 * t) * env
    return (0.3 * x / np.abs(x).max()).astype(np.float32)


def test_stoi_perfect_and_monotone():
    clean = _speech_like()
    assert stoi(clean, clean) > 0.999
    rng = np.random.default_rng(0)
    noise = rng.normal(size=clean.shape).astype(np.float32)
    scores = [stoi(clean, clean + a * noise) for a in (0.01, 0.05, 0.2, 0.5)]
    assert all(a >= b - 1e-6 for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.9 and scores[-1] < 0.85


def test_segsnr_bounds_and_perfect():
    clean = _speech_like()
    assert segmental_snr(clean, clean) == pytest.approx(35.0)  # clipped max
    noisy = clean + 10.0 * np.random.default_rng(1).normal(size=clean.shape)
    assert segmental_snr(clean, noisy) == pytest.approx(-10.0, abs=1.0)


def test_llr_zero_for_identical():
    clean = _speech_like()
    assert abs(llr(clean, clean)) < 1e-6
    noisy = clean + 0.3 * np.random.default_rng(2).normal(size=clean.shape).astype(np.float32)
    assert llr(clean, noisy) > 0.05


def test_wss_zero_for_identical_and_monotone():
    clean = _speech_like()
    assert wss(clean, clean) < 1e-9
    rng = np.random.default_rng(3)
    noise = rng.normal(size=clean.shape).astype(np.float32)
    w1 = wss(clean, clean + 0.05 * noise)
    w2 = wss(clean, clean + 0.5 * noise)
    assert 0 < w1 < w2


def test_si_sdr():
    clean = _speech_like()
    assert si_sdr(clean, clean) > 60
    assert si_sdr(clean, 3.0 * clean) > 60  # scale-invariant
    noisy = clean + 0.01 * np.random.default_rng(4).normal(size=clean.shape)
    v = si_sdr(clean, noisy)
    assert 5 < v < 40


def test_lpc_matches_toeplitz_solve():
    from scipy.linalg import solve_toeplitz

    rng = np.random.default_rng(5)
    # AR(4) process
    x = np.zeros(4000)
    e = rng.normal(size=4000)
    for n in range(4, 4000):
        x[n] = 0.6 * x[n - 1] - 0.2 * x[n - 2] + 0.1 * x[n - 3] + e[n]
    order = 8
    a, R = _lpc(x, order)
    ref = solve_toeplitz((R[:order], R[:order]), R[1 : order + 1])
    np.testing.assert_allclose(a[1:], -ref, atol=1e-8)
    # quadratic form matches explicit toeplitz matrix
    import scipy.linalg as sla

    T = sla.toeplitz(R[: order + 1])
    np.testing.assert_allclose(_quad_toeplitz(a, R), a @ T @ a, rtol=1e-10)


def test_eval_waveform_keys():
    clean = _speech_like(16000)
    noisy = clean + 0.1 * np.random.default_rng(6).normal(size=clean.shape).astype(np.float32)
    m = eval_waveform(clean * 32768, noisy * 32768)
    for k in ("stoi", "segsnr", "llr", "wss", "si_sdr"):
        assert np.isfinite(m[k]), (k, m[k])


def test_stoi_matches_pystoi_if_available():
    pystoi = pytest.importorskip("pystoi")
    clean = _speech_like()
    noisy = clean + 0.2 * np.random.default_rng(7).normal(size=clean.shape).astype(np.float32)
    ours = stoi(clean, noisy)
    theirs = pystoi.stoi(clean, noisy, 16000)
    assert abs(ours - theirs) < 0.02


# ---------------------------------------------------------------------------
# golden conformance vectors (tests/golden/metrics_golden.json)
#
# WSS/LLR/segSNR expectations were cross-computed ONCE by running the
# reference's own numpy implementations (python_eval.py wss/llr/snr, with
# its pesq/pystoi imports stubbed) on deterministic synthetic pairs; the
# STOI expectations come from a second, independently-written from-paper
# implementation.  tests/golden/gen_metric_goldens.py regenerates the file.
# ---------------------------------------------------------------------------

def _golden_pairs():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    from gen_metric_goldens import make_pairs

    return make_pairs()


def _golden_expected():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "metrics_golden.json")
    with open(path) as f:
        return json.load(f)["pairs"]


def test_golden_conformance_vectors():
    expected = _golden_expected()
    pairs = _golden_pairs()
    assert set(expected) == {name for name, *_ in pairs}
    for name, clean, proc in pairs:
        e = expected[name]
        got = {
            "wss": wss(clean, proc),
            "llr": llr(clean, proc),
            "segsnr": segmental_snr(clean, proc),
            "stoi": stoi(clean, proc, 16000),
        }
        # WSS is value-parity exact with the reference implementation;
        # LLR/segSNR differ only in numerically-tiny Levinson details;
        # STOI against the independent implementation
        assert got["wss"] == pytest.approx(e["wss"], rel=1e-9, abs=1e-9), name
        assert got["llr"] == pytest.approx(e["llr"], rel=0.02, abs=0.01), name
        assert got["segsnr"] == pytest.approx(e["segsnr"], rel=0.01, abs=0.05), name
        assert got["stoi"] == pytest.approx(e["stoi"], abs=0.005), name
