"""Synthetic evaluation material: generator robustness + invariants."""

import numpy as np

from cleanumamba_tpu.eval.synth import add_noise, noise_like, speech_dense, speech_like


def test_burst_clamp_at_buffer_end():
    """Seeds whose drawn burst overruns the buffer (start within fs//3 of
    the end, duration up to 0.35*fs) crashed before the round-5 clamp —
    found while re-mixing the zoo bank at fresh seeds
    (scripts/zoo_bank_spread.py).  Seeds 1684/3269 draw such a burst at
    4.5 s; the clamp truncates at the end without changing rng consumption
    (in-range seeds stay bit-identical, pinned by the committed
    docs/zoo_quality.json scores)."""
    for seed in (1684, 3269):
        x = speech_like(seed, seconds=4.5)
        assert x.shape == (72000,) and np.isfinite(x).all()
        assert abs(np.abs(x).max() - 0.3) < 1e-6


def test_generators_bounded_and_deterministic():
    for gen in (speech_like, speech_dense):
        a = gen(7, seconds=2.0)
        b = gen(7, seconds=2.0)
        np.testing.assert_array_equal(a, b)
        assert np.abs(a).max() <= 0.3 + 1e-9


def test_add_noise_hits_requested_snr():
    clean = speech_dense(3, seconds=2.0)
    for kind in ("white", "pink", "babble"):
        noisy = add_noise(clean, 10.0, seed=5, kind=kind)
        v = noisy - clean
        snr = 10 * np.log10(np.mean(clean**2) / np.mean(v**2))
        assert abs(snr - 10.0) < 0.2, (kind, snr)


def test_babble_talkers_survive_long_windows():
    # babble synthesizes 6 speech_like talkers at n/fs + 0.5 s — the burst
    # clamp must hold for every derived talker seed
    for seed in range(40):
        v = noise_like("babble", 64000, seed)
        assert np.isfinite(v).all()
