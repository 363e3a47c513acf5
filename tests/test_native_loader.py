"""Native C++ WAV loader tests: decode parity vs scipy, batch iteration,
crop/repeat-pad semantics, throughput sanity."""

import os

import numpy as np
import pytest

from cleanumamba_tpu.data.native_loader import (
    NativeWavLoader,
    decode_wav_native,
    native_available,
)
from cleanumamba_tpu.data.wavio import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = {"clean": [], "noisy": []}
    for i in range(3):
        n = [16000, 4000, 1000][i]  # one shorter than crop to test repeat-pad
        clean = (0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)).astype(np.float32)
        noisy = clean + 0.1 * rng.normal(size=n).astype(np.float32)
        cp = str(d / f"clean_{i}.wav")
        np_ = str(d / f"noisy_{i}.wav")
        write_wav(cp, clean, 16000)
        write_wav(np_, noisy, 16000)
        paths["clean"].append(cp)
        paths["noisy"].append(np_)
    return paths


def test_decode_matches_scipy(wav_dir):
    for p in wav_dir["clean"]:
        ours = decode_wav_native(p)
        ref, rate = read_wav(p)
        assert rate == 16000
        assert ours is not None and len(ours) == len(ref)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_batch_iteration(wav_dir):
    crop = 8000
    loader = NativeWavLoader(wav_dir["clean"], wav_dir["noisy"], crop,
                             batch_size=4, n_threads=2, seed=42)
    try:
        for _ in range(5):
            clean, noisy = next(loader)
            assert clean.shape == noisy.shape == (4, crop)
            assert np.isfinite(clean).all() and np.isfinite(noisy).all()
            # pairs stay aligned: noisy - clean is the (bounded) noise
            assert np.abs(noisy - clean).max() < 1.0
            assert np.abs(clean).max() > 0  # not all-zero
    finally:
        loader.close()


def test_repeat_pad_short_clip(wav_dir):
    # only the 1000-sample file, crop 4000 -> must tile it
    crop = 4000
    loader = NativeWavLoader([wav_dir["clean"][2]], [wav_dir["noisy"][2]], crop,
                             batch_size=1, n_threads=1, seed=0)
    try:
        clean, _ = next(loader)
        ref, _ = read_wav(wav_dir["clean"][2])
        np.testing.assert_allclose(clean[0][:1000], ref, atol=1e-6)
        np.testing.assert_allclose(clean[0][1000:2000], ref, atol=1e-6)
    finally:
        loader.close()
