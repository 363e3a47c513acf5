"""From-scratch ITU-T P.862 / P.862.2 PESQ property tests.

No oracle implementation exists in this image (the ``pesq`` C lib is
absent), so conformance is established by the properties the
recommendation itself pins down: identity scores, mapping endpoints,
MNRU/SNR monotonicity, level + delay invariance (the level- and
time-alignment stages), asymmetry (additive noise worse than attenuation),
and calibration-anchor agreement (exp/calibrate_pesq.py).

Reference wiring parity: python_eval.py:108-124 (pesq(16000, clean, deg,
'wb'|'nb') -> MOS-LQO).
"""

import math

import numpy as np
import pytest

from cleanumamba_tpu.eval.metrics import eval_waveform
from cleanumamba_tpu.eval.pesq_p862 import pesq_p862

from cleanumamba_tpu.eval.synth import speech_like as _speech  # noqa: E402

FS = 16000


def _add_noise(clean, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=len(clean))
    noise *= np.sqrt(np.mean(clean ** 2) / np.mean(noise ** 2)
                     / 10 ** (snr_db / 10.0))
    return clean + noise


def test_band_table_consistency():
    """Cross-validate the transcribed P.862 band tables: the independently
    transcribed centre and width sequences must satisfy
    centre = cumsum(width) - width/2 (the bands tile the modified-Bark axis
    contiguously), span [0, ~21.34] Bark, and the Hz warping implied by the
    (centre_bark, centre_hz) pairs must be smooth and monotone with the
    8 kHz structure ending at ~4 kHz Nyquist."""
    from cleanumamba_tpu.eval.pesq_p862 import (
        _ABS_THRESH_POWER_16K,
        _CENTRE_BARK_16K,
        _CENTRE_HZ_16K,
        _N_BANDS_8K,
        _WIDTH_BARK_16K,
        _band_bin_weights,
    )

    cb = np.cumsum(_WIDTH_BARK_16K) - _WIDTH_BARK_16K / 2
    np.testing.assert_allclose(cb, _CENTRE_BARK_16K, atol=5e-6)
    total_bark = cb[-1] + _WIDTH_BARK_16K[-1] / 2
    assert 21.2 < total_bark < 21.5
    # warping slope dHz/dBark positive and increasing (smooth warping)
    slope = np.diff(_CENTRE_HZ_16K) / np.diff(_CENTRE_BARK_16K)
    assert np.all(slope > 0)
    assert slope[0] < 110 and slope[-1] > 1000
    # 8 kHz structure = first 42 bands, upper edge at the 4 kHz Nyquist
    upper_42 = _CENTRE_HZ_16K[_N_BANDS_8K - 1]
    assert 3700 < upper_42 < 4000
    # thresholds: positive, high at LF, minimum in the 0.9-1.5 kHz region
    assert np.all(_ABS_THRESH_POWER_16K > 0)
    assert _ABS_THRESH_POWER_16K[0] > 1e6
    assert 20 <= int(np.argmin(_ABS_THRESH_POWER_16K)) <= 30
    # fractional-bin weights: every bin fully assigned (columns sum to 1)
    # within the tabulated band span
    W = _band_bin_weights(16000, 512, 49)
    col = W.sum(axis=0)
    assert np.all(col[1:250] > 0.999)  # interior bins fully covered
    assert np.all(col <= 1.0 + 1e-9)


def test_identity_scores():
    """Identical signals score the known P.862 saturation values
    (raw 4.5 through both logistic maps)."""
    clean = _speech(0)
    wb = pesq_p862(FS, clean, clean, "wb")
    nb = pesq_p862(FS, clean, clean, "nb")
    expect_wb = 0.999 + 4.0 / (1.0 + math.exp(-1.3669 * 4.5 + 3.8224))
    expect_nb = 0.999 + 4.0 / (1.0 + math.exp(-1.4945 * 4.5 + 4.6607))
    assert abs(wb - expect_wb) < 1e-3  # ~4.644
    assert abs(nb - expect_nb) < 1e-3  # ~4.549


def test_snr_monotonicity():
    clean = _speech(1)
    prev_wb, prev_nb = 5.0, 5.0
    for snr in (40, 30, 20, 10, 0):
        deg = _add_noise(clean, snr, seed=snr)
        wb = pesq_p862(FS, clean, deg, "wb")
        nb = pesq_p862(FS, clean, deg, "nb")
        assert wb <= prev_wb + 1e-9
        assert nb <= prev_nb + 1e-9
        assert 1.0 <= wb <= 4.7 and 1.0 <= nb <= 4.6
        prev_wb, prev_nb = wb, nb
    # clearly audible noise must be clearly penalised
    assert prev_wb < 2.0


def test_mnru_monotonicity():
    clean = _speech(2)
    rng = np.random.default_rng(9)
    noise = rng.normal(size=len(clean))
    prev = 5.0
    for q in (40, 30, 20, 10, 5):
        deg = clean * (1.0 + noise * 10.0 ** (-q / 20.0))
        nb = pesq_p862(FS, clean, deg, "nb")
        assert nb <= prev + 1e-9
        prev = nb
    assert prev < 2.5


def test_calibration_anchors():
    """Spot-check two MNRU anchors against their calibration targets."""
    for q, target, tol in ((20, 3.0, 0.45), (35, 4.3, 0.45)):
        vals = []
        for seed in range(3):
            clean = _speech(10 + seed)
            rng = np.random.default_rng(100 + seed)
            deg = clean * (1.0 + rng.normal(size=len(clean)) * 10 ** (-q / 20))
            vals.append(pesq_p862(FS, clean, deg, "nb"))
        assert abs(float(np.mean(vals)) - target) < tol, (q, np.mean(vals))


def test_level_invariance():
    clean = _speech(3)
    deg = _add_noise(clean, 15, seed=1)
    base = pesq_p862(FS, clean, deg, "wb")
    assert abs(pesq_p862(FS, clean, 3.0 * deg, "wb") - base) < 0.05
    assert abs(pesq_p862(FS, 0.25 * clean, deg, "wb") - base) < 0.05


def test_delay_invariance():
    clean = _speech(4)
    deg = _add_noise(clean, 15, seed=2)
    base = pesq_p862(FS, clean, deg, "wb")
    for shift in (160, 320, -240):
        if shift >= 0:
            sh = np.concatenate([np.zeros(shift), deg[:len(deg) - shift]])
        else:
            sh = np.concatenate([deg[-shift:], np.zeros(-shift)])
        assert abs(pesq_p862(FS, clean, sh, "wb") - base) < 0.15, shift


def test_attenuation_vs_noise_asymmetry():
    """Pure attenuation (gain compensated) must score far better than
    additive noise of comparable energy difference."""
    clean = _speech(5)
    att = pesq_p862(FS, clean, 0.5 * clean, "wb")
    noisy = pesq_p862(FS, clean, _add_noise(clean, 10, seed=3), "wb")
    assert att > 4.5
    assert noisy < att - 1.0


def test_denoising_ordering():
    """noisy < partially-denoised < clean — the ordering the framework's
    quality gate relies on."""
    clean = _speech(6)
    noisy = _add_noise(clean, 5, seed=4)
    half = clean + 0.25 * (noisy - clean)  # 12 dB residual-noise reduction
    s_noisy = pesq_p862(FS, clean, noisy, "wb")
    s_half = pesq_p862(FS, clean, half, "wb")
    s_clean = pesq_p862(FS, clean, clean, "wb")
    assert s_noisy < s_half < s_clean


def test_input_validation():
    clean = _speech(7)
    with pytest.raises(ValueError):
        pesq_p862(FS, clean, clean, "xb")
    with pytest.raises(ValueError):
        pesq_p862(44100, clean, clean, "wb")
    with pytest.raises(ValueError):
        pesq_p862(8000, clean, clean, "wb")
    with pytest.raises(ValueError):
        pesq_p862(FS, clean[:100], clean[:100], "nb")


def test_nb_at_8k():
    clean = _speech(8)[::2]  # naive 8 kHz decimation is fine for this check
    v = pesq_p862(8000, clean, clean, "nb")
    assert v > 4.5


def test_eval_waveform_includes_pesq_and_composites():
    """eval_waveform now produces the full metric set (reference
    python_eval.py:108-124) with no C libs."""
    clean = _speech(9, seconds=2.0)
    deg = _add_noise(clean, 10, seed=5)
    out = eval_waveform(clean, deg, FS)
    for k in ("pesq_wb", "pesq_nb", "csig", "cbak", "covl"):
        assert out[k] is not None and np.isfinite(out[k]), k
    assert 1.0 <= out["pesq_wb"] <= 4.7
    assert 1.0 <= out["csig"] <= 5.0
    # clean-vs-clean beats clean-vs-noisy on every quality axis
    ref = eval_waveform(clean, clean, FS)
    assert ref["pesq_wb"] > out["pesq_wb"]
    assert ref["covl"] > out["covl"]
