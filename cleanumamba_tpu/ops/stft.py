"""STFT magnitude with torch.stft-compatible semantics, computed on the MXU.

Replicates the exact framing the reference's loss uses
(/root/reference/src/util/stft_loss.py:16-38): ``torch.stft`` defaults —
center=True, reflect padding of n_fft//2 on both sides, the window
zero-padded symmetrically from win_length to n_fft, one-sided rfft, and the
magnitude clamped at 1e-7 before sqrt (NaN guard, stft_loss.py:37-38).

TPU design note: the obvious frame-gather + rfft formulation costs ~25 ms
forward and ~92 ms backward at training shapes (the gather's AD transpose is
a scatter-add, and TPU FFTs are slow).  A width-n_fft strided conv against a
DFT filter bank fixes the runtime but takes minutes of XLA compile.  Instead:
frames are assembled from ceil(n_fft/hop) STATIC hop-strided slices of the
padded signal (AD transpose = pads and adds, no scatter), then the windowed
one-sided DFT is ONE matmul against a precomputed (n_fft, 2·(n_fft/2+1))
basis: rfft_k(w·x) = Σ_n x_n·(w_n·cos θ_kn) − i·Σ_n x_n·(w_n·sin θ_kn).
Both directions are MXU GEMMs.

Survey §7 flags "STFT-loss gradient parity" as a hard part: the framing
below is validated frame-for-frame against torch.stft in tests/test_losses.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _hann_padded(win_length: int, n_fft: int) -> np.ndarray:
    """torch.hann_window(win) zero-padded centered to n_fft (torch.stft
    semantics for win_length < n_fft)."""
    n = np.arange(win_length)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    pad_l = (n_fft - win_length) // 2
    out = np.zeros(n_fft, np.float64)
    out[pad_l : pad_l + win_length] = win
    return out


@functools.lru_cache(maxsize=None)
def _dft_bank(win_length: int, n_fft: int) -> np.ndarray:
    """Windowed one-sided DFT as conv filters: (2*(n_fft//2+1), n_fft) fp32,
    rows [0, F) the real (cos) basis, rows [F, 2F) the imag (−sin) basis."""
    w = _hann_padded(win_length, n_fft)  # float64 for basis accuracy
    k = np.arange(n_fft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(k, np.arange(n_fft)) / n_fft
    return np.concatenate(
        [np.cos(ang) * w, -np.sin(ang) * w], axis=0
    ).astype(np.float32)


def stft_magnitude(x, fft_size: int, hop_size: int, win_length: int):
    """|STFT| of x (B, T) -> (B, n_frames, fft_size//2 + 1).

    Matches reference stft() (stft_loss.py:16-38) including the final
    transpose to (frames, freq) layout.
    """
    B, T = x.shape
    pad = fft_size // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + T // hop_size
    # frames via K static hop-strided slices of the hop-blocked signal:
    # frames[:, i, j*hop:(j+1)*hop] = xp[:, (i+j)*hop : (i+j+1)*hop]
    K = -(-fft_size // hop_size)
    need = (n_frames - 1 + K) * hop_size
    if need > xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
    blocks = xp[:, :need].reshape(B, n_frames - 1 + K, hop_size)
    frames = jnp.concatenate(
        [blocks[:, j : j + n_frames] for j in range(K)], axis=-1
    )[..., :fft_size]  # (B, n_frames, fft_size)
    bank = jnp.asarray(_dft_bank(win_length, fft_size))  # (2F, n_fft)
    out = jnp.einsum(
        "bnf,kf->bnk", frames, bank, precision=jax.lax.Precision.HIGHEST
    )
    F = fft_size // 2 + 1
    power = out[..., :F] ** 2 + out[..., F:] ** 2
    return jnp.sqrt(jnp.clip(power, min=1e-7))
