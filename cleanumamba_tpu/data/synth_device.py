"""On-device synthetic clean+noisy batch generation (pure JAX, jittable).

The host-side ``SyntheticDenoiseDataset`` (data/dataset.py) is cheap to
*generate* (~17 ms/item) but expensive to *ship*: a batch-2 x 10 s fp32
pair is ~5 MB of host->device traffic per step, which through this
environment's tunnelled TPU dominates the ~30 ms train step itself.  This
module draws the same distribution family directly on the device from a
PRNG key — zero host involvement — so the whole training loop can run as
one fused on-device scan (see ``train.trainer.make_device_data_steps``).

Distribution (mirrors SyntheticDenoiseDataset item for item in family,
not bit-for-bit — different RNG):
  clean  = sum of ~3/sec "syllables": 5-harmonic stacks at f0~U(80,300)
           with Hann envelopes at random positions/durations, peak-scaled
           to U(0.2, 0.8);
  noise  = white normal coloured by an 8-tap exp(-i/tau) kernel,
           tau~U(1,4), mixed at SNR~U(snr_range) dB.

The reference has no equivalent (its data path is torch DataLoader over
wav files, src/dataset.py); this is the TPU-native synthetic path.  For
real DNS/VCTK material the host loader + its C++ reader remain the path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _syllable_bank(key, length, sr, n_seg):
    """Sum of ``n_seg`` masked harmonic stacks over a (length,) buffer."""
    kf0, kst, kdur, kamp, kph = jax.random.split(key, 5)
    f0 = jax.random.uniform(kf0, (n_seg, 1), minval=80.0, maxval=300.0)
    start = jax.random.uniform(kst, (n_seg, 1), maxval=float(length))
    start = jnp.floor(start)
    dur = jnp.floor(jax.random.uniform(kdur, (n_seg, 1),
                                       minval=0.1 * sr, maxval=0.4 * sr))
    amps = jax.random.uniform(kamp, (n_seg, 5, 1), minval=0.2, maxval=1.0) \
        / jnp.arange(1.0, 6.0)[None, :, None]
    phase = jax.random.uniform(kph, (n_seg, 5, 1), maxval=6.28)

    idx = jnp.arange(length, dtype=jnp.float32)[None, :]       # (1, L)
    rel = idx - start                                          # (n_seg, L)
    mask = (rel >= 0) & (rel < dur)
    tt = jnp.where(mask, rel, 0.0) / sr                        # (n_seg, L)
    env = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * rel / jnp.maximum(dur - 1, 1))
    env = jnp.where(mask, env, 0.0)
    k = jnp.arange(1.0, 6.0)[None, :, None]                    # (1, 5, 1)
    sig = jnp.sum(amps * jnp.sin(2.0 * jnp.pi * f0[:, None, :] * k * tt[:, None, :]
                                 + phase), axis=1)             # (n_seg, L)
    return jnp.sum(env * sig, axis=0)                          # (L,)


def _one(key, length, sr, snr_lo, snr_hi):
    n_seg = max(1, int(length / sr * 3))
    kc, klvl, kn, ktau, ksnr = jax.random.split(key, 5)
    clean = _syllable_bank(kc, length, sr, n_seg)
    peak = jnp.abs(clean).max() + 1e-6
    clean = clean * (jax.random.uniform(klvl, (), minval=0.2, maxval=0.8) / peak)

    white = jax.random.normal(kn, (length,))
    tau = jax.random.uniform(ktau, (), minval=1.0, maxval=4.0)
    kern = jnp.exp(-jnp.arange(8.0) / tau)
    kern = kern / kern.sum()
    # np.convolve(white, kern, mode="same")[n] = sum_i kern[i]*white[n+3-i]
    # as a static stack of shifted slices (no conv op needed for 8 taps)
    pad = jnp.pad(white, (4, 3))                # pad[m] = white[m-4]
    noise = jnp.zeros_like(clean)
    for i in range(8):
        noise = noise + kern[i] * jax.lax.dynamic_slice(pad, (7 - i,), (length,))

    snr_db = jax.random.uniform(ksnr, (), minval=snr_lo, maxval=snr_hi)
    p_c = jnp.mean(clean ** 2) + 1e-12
    p_n = jnp.mean(noise ** 2) + 1e-12
    noise = noise * jnp.sqrt(p_c / (p_n * 10.0 ** (snr_db / 10.0)))
    return clean, clean + noise


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def synth_batch(key, batch: int, length: int, sr: int = 16000,
                snr_lo: float = 0.0, snr_hi: float = 15.0):
    """(clean, noisy), each (batch, length) fp32, deterministic per key."""
    keys = jax.random.split(key, batch)
    clean, noisy = jax.vmap(lambda k: _one(k, length, sr, snr_lo, snr_hi))(keys)
    return clean.astype(jnp.float32), noisy.astype(jnp.float32)
