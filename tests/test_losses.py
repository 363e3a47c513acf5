"""STFT-loss parity vs torch oracle (survey §7 flags torch.stft framing
semantics — window placement, one-sided rfft, clamp — as a hard part)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import LossConfig, STFTLossConfig
from cleanumamba_tpu.losses import loss_fn, multi_resolution_stft_loss, stft_loss
from cleanumamba_tpu.ops.stft import stft_magnitude

torch = pytest.importorskip("torch")


def _torch_stft_mag(x, fft_size, hop, win_length):
    window = torch.hann_window(win_length)
    st = torch.stft(
        torch.from_numpy(x), fft_size, hop, win_length, window, return_complex=False
    )
    real, imag = st[..., 0], st[..., 1]
    return (
        torch.sqrt(torch.clamp(real**2 + imag**2, min=1e-7))
        .transpose(2, 1)
        .numpy()
    )


@pytest.mark.parametrize(
    "fft,hop,win", [(512, 50, 240), (1024, 120, 600), (2048, 240, 1200)]
)
def test_stft_magnitude_matches_torch(rng, fft, hop, win):
    x = rng.normal(size=(2, 8000)).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(x), fft, hop, win))
    theirs = _torch_stft_mag(x, fft, hop, win)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_multi_resolution_loss_values(rng):
    """Compare against a direct numpy port of the reference formulas."""
    x = rng.normal(size=(2, 6000)).astype(np.float32)
    y = (x + 0.1 * rng.normal(size=x.shape)).astype(np.float32)
    cfg = STFTLossConfig(band="full")
    sc, mag = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y), cfg)
    # torch oracle
    sc_t, mag_t = 0.0, 0.0
    for fs, hs, wl in zip(cfg.fft_sizes, cfg.hop_sizes, cfg.win_lengths):
        xm = torch.from_numpy(_torch_stft_mag(x, fs, hs, wl))
        ym = torch.from_numpy(_torch_stft_mag(y, fs, hs, wl))
        sc_t += (torch.norm(ym - xm) / torch.norm(ym)).item()
        mag_t += torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm)).item()
    n = len(cfg.fft_sizes)
    np.testing.assert_allclose(float(sc), cfg.sc_lambda * sc_t / n, rtol=1e-3)
    np.testing.assert_allclose(float(mag), cfg.mag_lambda * mag_t / n, rtol=1e-3)


def test_band_high_slices_frames(rng):
    """The reference's band="high" masks the second half of *time frames*
    (CleanUNet lineage quirk, stft_loss.py:117-120) — we replicate exactly."""
    x = rng.normal(size=(1, 4000)).astype(np.float32)
    y = x.copy()
    y[:, : 4000 // 2] += 1.0  # corrupt only the first half in time
    sc_full, _ = stft_loss(jnp.asarray(x), jnp.asarray(y), 512, 50, 240, "full")
    sc_high, _ = stft_loss(jnp.asarray(x), jnp.asarray(y), 512, 50, 240, "high")
    # the corruption lives in early frames -> "high" (late frames) sees less
    assert float(sc_high) < float(sc_full)


@pytest.mark.slow
def test_loss_fn_grad(rng):
    clean = jnp.asarray(rng.normal(size=(2, 4000)), jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(2, 4000)), jnp.float32)
    cfg = LossConfig()

    def f(x):
        loss, aux = loss_fn(x, clean, cfg)
        return loss

    g = jax.grad(f)(noisy)
    assert np.isfinite(np.asarray(g)).all()
    loss, aux = loss_fn(noisy, clean, cfg)
    assert set(aux) >= {"reconstruct", "stft_sc", "stft_mag", "loss"}
    # zero loss at perfect reconstruction (sc=0, mag=0, l1=0)
    loss0, _ = loss_fn(clean, clean, cfg)
    assert float(loss0) < 1e-6
