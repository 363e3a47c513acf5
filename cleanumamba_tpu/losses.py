"""Training losses: L1/L2 + multi-resolution STFT (+ knowledge distillation).

Parity with the reference loss stack:
- ``MultiResolutionSTFTLoss`` (stft_loss.py:130-184): 3 resolutions, each
  contributing spectral-convergence ``||Y-X||_F/||Y||_F`` (:41-59) and
  log-magnitude L1 (:62-80), averaged and scaled by sc_lambda/mag_lambda.
- ``loss_fn`` (util.py:215-327): ell_p reconstruction + stft (+ optional KD
  over skip connections, :259-290).

Note on ``band="high"``: the reference (inherited from NVIDIA CleanUNet)
slices ``x_mag[:, ind:, :]`` where axis 1 is the *frames* axis after the
transpose in stft() — i.e. it masks the second half of *time frames*, not
frequencies (stft_loss.py:117-120).  We replicate that exactly for training
parity under band="high", and additionally offer band="high_freq" that slices
the frequency axis (the documented intent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import LossConfig, STFTLossConfig
from cleanumamba_tpu.ops.stft import stft_magnitude


def _spectral_convergence(x_mag, y_mag):
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def _log_magnitude_l1(x_mag, y_mag):
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


def stft_loss(x, y, fft_size, hop_size, win_length, band: str = "full"):
    """Single-resolution (sc, mag) losses for predicted x vs target y (B, T)."""
    x_mag = stft_magnitude(x, fft_size, hop_size, win_length)
    y_mag = stft_magnitude(y, fft_size, hop_size, win_length)
    if band == "high":
        ind = x_mag.shape[1] // 2  # frames axis — reference behaviour
        x_mag, y_mag = x_mag[:, ind:, :], y_mag[:, ind:, :]
    elif band == "high_freq":
        ind = x_mag.shape[2] // 2
        x_mag, y_mag = x_mag[..., ind:], y_mag[..., ind:]
    elif band != "full":
        raise NotImplementedError(band)
    return _spectral_convergence(x_mag, y_mag), _log_magnitude_l1(x_mag, y_mag)


def multi_resolution_stft_loss(x, y, cfg: STFTLossConfig):
    """(sc_loss, mag_loss) averaged over resolutions and scaled by lambdas."""
    sc_total, mag_total = 0.0, 0.0
    n = len(cfg.fft_sizes)
    for fs, hs, wl in zip(cfg.fft_sizes, cfg.hop_sizes, cfg.win_lengths):
        sc, mag = stft_loss(x, y, fs, hs, wl, cfg.band)
        sc_total += sc
        mag_total += mag
    return cfg.sc_lambda * sc_total / n, cfg.mag_lambda * mag_total / n


def loss_fn(
    denoised,
    clean,
    cfg: LossConfig,
    skips=None,
    teacher_skips=None,
    kd_adapters=None,
):
    """Total loss + per-component dict (reference util.py:215-327).

    denoised, clean: (B, L) waveforms (the forward pass happens outside so
    the same function serves eval and jit'd train steps).
    """
    aux = {}
    loss = 0.0

    if cfg.ell_p == 2:
        ae = jnp.mean((denoised - clean) ** 2)
    elif cfg.ell_p == 1:
        ae = jnp.mean(jnp.abs(denoised - clean))
    else:
        raise NotImplementedError(cfg.ell_p)
    loss = loss + ae * cfg.ell_p_lambda
    aux["reconstruct"] = ae * cfg.ell_p_lambda

    if cfg.stft_lambda > 0:
        sc, mag = multi_resolution_stft_loss(
            denoised.astype(jnp.float32), clean.astype(jnp.float32), cfg.stft_config
        )
        loss = loss + (sc + mag) * cfg.stft_lambda
        aux["stft_sc"] = sc * cfg.stft_lambda
        aux["stft_mag"] = mag * cfg.stft_lambda

    if skips is not None and teacher_skips is not None:
        # KD following "Understanding the Role of the Projector in Knowledge
        # Distillation" as applied in the reference (util.py:259-290):
        # student skip -> 1x1 projection + batch-norm; teacher -> batch-norm;
        # loss = log(sum(|diff|^4)) per connection, averaged.
        kd_losses = []
        for ad, s_c, t_c in zip(kd_adapters, skips, teacher_skips):
            s_n = _kd_norm(s_c @ ad["embed_w"] + ad["embed_b"], ad["bn_s"])
            t_n = _kd_norm(t_c, ad["bn_t"])
            diff = jnp.abs(s_n - t_n) ** 4.0
            kd_losses.append(jnp.log(jnp.sum(diff)) * cfg.kd_p)
        kd = jnp.mean(jnp.stack(kd_losses))
        loss = loss + kd
        aux["kd_loss"] = kd

    aux["loss"] = loss
    return loss, aux


def _kd_norm(x, bn):
    """Batch-norm style normalisation over (batch, time) per channel."""
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.var(x, axis=(0, 1), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * bn["scale"] + bn["bias"]
