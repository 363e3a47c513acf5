"""Constant-memory streaming inference engine.

Reimplements the reference's ``feed``/``_denoise_frame``/``flush`` streaming
path (/root/reference/src/network/CleanUMamba.py:358-490) as pure jitted
step functions over a carried-state pytree — no Python-side mutation, fully
static shapes, so the whole per-frame step is one XLA executable and can be
``lax.scan``-ed over many frames for on-device benchmarking.

Per frame of ``frame_length`` samples the model emits ``total_stride`` output
samples.  Carried state:

- ``input_tail``: last (frame_length - total_stride) raw input samples,
- ``input_std`` / ``frames``: running-mean normalisation EMA (reference
  CleanUMamba.py:399-401),
- ``enc[i]``: cached suffix of each encoder level's frame output (reference
  ``enc{i}``, :432-442) — the incremental encoder convolves only the new
  suffix each frame,
- ``dec[j]``: decoder overlap-add tails *minus the ConvTranspose bias*
  (reference :479-484 — the bias is subtracted before caching so it is not
  double-added when the next frame's overlap lands on it),
- ``bottleneck``: per-layer mixer caches (conv_state/ssm_state for Mamba,
  h/c for LSTM, ring KV for MHA).

All static offsets below derive from: at level i (0-based), each frame
produces ``stride_i = S^(D-1-i)`` new outputs, consuming the last
``K + S*(stride_i - 1)`` samples of the previous level's frame output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import (
    decoder_level,
    encoder_level,
)
from cleanumamba_tpu.models import (
    bottleneck_lstm,
    bottleneck_mamba,
    bottleneck_mamba2,
    bottleneck_mha,
    bottleneck_s4,
)
from cleanumamba_tpu.ops.norms import layer_norm, rms_norm

_STEP_MIXERS = {
    "mamba": bottleneck_mamba,
    "mamba2": bottleneck_mamba2,
    "mamba_s4": bottleneck_s4,
}


def _level_lengths(cfg: CleanUMambaConfig) -> List[int]:
    """Frame-output length at each encoder level (E8: 382,190,...,4,1)."""
    lens = []
    l = cfg.frame_length
    for _ in range(cfg.encoder_n_layers):
        l = (l - cfg.kernel_size) // cfg.stride + 1
        lens.append(l)
    return lens


def _level_strides(cfg: CleanUMambaConfig) -> List[int]:
    """New outputs per frame at each level = S^(D-1-i)."""
    D, S = cfg.encoder_n_layers, cfg.stride
    return [S ** (D - 1 - i) for i in range(D)]


# --------------------------------------------------------------------------
# Bottleneck single-token dispatch
# --------------------------------------------------------------------------

def _bottleneck_init_cache(params, cfg: CleanUMambaConfig, batch: int, dtype):
    bp = params["bottleneck"]
    if cfg.bottleneck == "lstm":
        return bottleneck_lstm.init_cache(bp["layers"], batch, dtype)
    if cfg.bottleneck == "mha":
        # KV window: covers >=10 s of audio at the bottleneck rate
        max_len = max(1, (16000 * 10) // cfg.total_stride)
        return bottleneck_mha.init_cache(bp, cfg, batch, max_len, dtype)
    mixer = _STEP_MIXERS[cfg.bottleneck]
    return [mixer.mixer_init_cache(lp["mixer"], batch, dtype) for lp in bp["layers"]]


def _bottleneck_step(params, cfg: CleanUMambaConfig, cache, x):
    """x: (B, d_model) single bottleneck token -> (cache', y)."""
    bp = params["bottleneck"]
    if cfg.bottleneck == "lstm":
        return bottleneck_lstm.step(bp["layers"], cache, x)
    if cfg.bottleneck == "mha":
        return bottleneck_mha.step(bp, cfg, cache, x)
    mixer = _STEP_MIXERS[cfg.bottleneck]
    hidden = x
    residual = None
    new_cache = []
    for lp, lc in zip(bp["layers"], cache):
        residual = (
            hidden.astype(jnp.float32) + residual
            if residual is not None
            else hidden.astype(jnp.float32)
        )
        if cfg.rms_norm:
            hidden = rms_norm(residual, lp["norm"]["scale"], cfg.norm_epsilon)
        else:
            hidden = layer_norm(residual, lp["norm"]["scale"], lp["norm"]["bias"], cfg.norm_epsilon)
        hidden = hidden.astype(x.dtype)
        nc, hidden = mixer.mixer_step(lp["mixer"], lc, hidden)
        new_cache.append(nc)
    residual = hidden.astype(jnp.float32) + residual
    nf = bp["norm_f"]
    if cfg.rms_norm:
        out = rms_norm(residual, nf["scale"], cfg.norm_epsilon)
    else:
        out = layer_norm(residual, nf["scale"], nf["bias"], cfg.norm_epsilon)
    return new_cache, out.astype(x.dtype)


# --------------------------------------------------------------------------
# Shared decoder/bottleneck tail (used by both prime and step)
# --------------------------------------------------------------------------

def _decode_frame(params, cfg, skips, bott_cache, dec_caches, dtype):
    """From level-wise skip activations (one frame) to total_stride samples.

    skips[i]: (B, len_i, C_i) full frame output of encoder level i.
    Returns (new_bott_cache, new_dec_caches, out (B, total_stride, 1)).
    """
    D, S = cfg.encoder_n_layers, cfg.stride
    x = skips[-1]  # (B, 1, C_last)
    x = x @ params["tsfm_conv1"]["w"][0].astype(dtype) + params["tsfm_conv1"]["b"].astype(dtype)
    bott_cache, y = _bottleneck_step(params, cfg, bott_cache, x[:, 0, :])
    x = y[:, None, :]
    x = x @ params["tsfm_conv2"]["w"][0].astype(dtype) + params["tsfm_conv2"]["b"].astype(dtype)

    new_dec = []
    rev_skips = skips[::-1]
    for j, dp in enumerate(params["decoder"]):
        enc_i = D - 1 - j
        x = x + rev_skips[j][:, : x.shape[1], :]
        # mix + GLU + convT (no relu yet; relu applies after overlap-add)
        x = decoder_level(dp, x, cfg, enc_i, relu=False)
        # cache tail minus bias so the bias isn't double-counted next frame
        tail = x[:, -S:, :] - dp["convt_b"].astype(dtype)
        new_dec.append(tail)
        x = x[:, :-S, :]
        prev = dec_caches[j] if dec_caches is not None else None
        if prev is not None:
            x = x.at[:, :S, :].add(prev)
        if j != D - 1:
            x = jax.nn.relu(x)
    return bott_cache, new_dec, x


# --------------------------------------------------------------------------
# Prime (first frame) and steady-state step
# --------------------------------------------------------------------------

def stream_prime(params, cfg: CleanUMambaConfig, frame, dtype=jnp.float32):
    """Process the first full frame (frame_length raw samples).

    frame: (B, frame_length).  Returns (state, out (B, total_stride)).
    """
    B = frame.shape[0]
    assert frame.shape[1] == cfg.frame_length
    lens = _level_lengths(cfg)
    strides = _level_strides(cfg)

    x = frame[..., None].astype(dtype)
    if cfg.normalize_input:
        std = jnp.std(frame.astype(jnp.float32), axis=1, keepdims=True) + 1e-3
        x = x / std[..., None].astype(dtype)
    else:
        std = jnp.ones((B, 1), jnp.float32)

    skips = []
    enc_caches = []
    for i, ep in enumerate(params["encoder"]):
        x = encoder_level(ep, x, cfg, i)
        skips.append(x)
        enc_caches.append(x[:, strides[i] :, :])

    bott_cache = _bottleneck_init_cache(params, cfg, B, dtype)
    bott_cache, dec_caches, out = _decode_frame(
        params, cfg, skips, bott_cache, None, dtype
    )
    out = out[:, : cfg.total_stride, 0]
    if cfg.normalize_input:
        out = out * std.astype(out.dtype)

    state = {
        "input_tail": frame[:, cfg.total_stride :],
        "input_std": std,
        "frames": jnp.ones((), jnp.int32),
        "enc": enc_caches,
        "dec": dec_caches,
        "bottleneck": bott_cache,
    }
    return state, out


def stream_step(params, cfg: CleanUMambaConfig, state, new_samples, dtype=jnp.float32):
    """Steady-state step: consume total_stride new raw samples, emit the same.

    new_samples: (B, total_stride).  Returns (state', out (B, total_stride)).
    """
    K, S, D = cfg.kernel_size, cfg.stride, cfg.encoder_n_layers
    strides = _level_strides(cfg)
    frame = jnp.concatenate([state["input_tail"], new_samples], axis=1)

    frames = state["frames"] + 1
    if cfg.normalize_input:
        std_now = jnp.std(frame.astype(jnp.float32), axis=1, keepdims=True) + 1e-3
        inv_n = 1.0 / frames.astype(jnp.float32)
        input_std = std_now * inv_n + (1.0 - inv_n) * state["input_std"]
    else:
        input_std = state["input_std"]

    x_prev_full = (frame[..., None] / input_std[..., None]).astype(dtype) \
        if cfg.normalize_input else frame[..., None].astype(dtype)

    skips = []
    enc_caches = []
    for i, ep in enumerate(params["encoder"]):
        suffix_len = K + S * (strides[i] - 1)
        new_out = encoder_level(ep, x_prev_full[:, -suffix_len:, :], cfg, i)
        x_full = jnp.concatenate([state["enc"][i], new_out], axis=1)
        skips.append(x_full)
        enc_caches.append(x_full[:, strides[i] :, :])
        x_prev_full = x_full

    bott_cache, dec_caches, out = _decode_frame(
        params, cfg, skips, state["bottleneck"], state["dec"], dtype
    )
    out = out[:, : cfg.total_stride, 0]
    if cfg.normalize_input:
        out = out * input_std.astype(out.dtype)

    new_state = {
        "input_tail": frame[:, cfg.total_stride :],
        "input_std": input_std,
        "frames": frames,
        "enc": enc_caches,
        "dec": dec_caches,
        "bottleneck": bott_cache,
    }
    return new_state, out


def stream_many(params, cfg: CleanUMambaConfig, state, blocks, dtype=jnp.float32, unroll: int = 1):
    """On-device multi-frame streaming: ``lax.scan`` the step over
    (n_frames, B, total_stride) blocks.  Returns (state', (B, n*stride))."""

    def body(st, blk):
        st, out = stream_step(params, cfg, st, blk, dtype)
        return st, out

    state, outs = jax.lax.scan(body, state, blocks, unroll=unroll)
    outs = jnp.swapaxes(outs, 0, 1).reshape(blocks.shape[1], -1)
    return state, outs


class Streamer:
    """Host-side convenience wrapper mirroring the reference feed/flush API
    (CleanUMamba.py:358-418): accepts arbitrary-length chunks, internally
    steps the jitted frame functions, returns denoised audio incrementally.
    """

    def __init__(self, params, cfg: CleanUMambaConfig, batch: int = 1, dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.batch = batch
        self._prime = jax.jit(lambda p, f: stream_prime(p, cfg, f, dtype))
        self._step = jax.jit(lambda p, s, n: stream_step(p, cfg, s, n, dtype))
        # multi-frame scan: one device dispatch per feed() instead of one per
        # 16 ms frame (crucial when host<->device latency is high)
        self._many = jax.jit(lambda p, s, b: stream_many(p, cfg, s, b, dtype))
        self.state = None
        self.pending = np.zeros((batch, 0), np.float32)
        self.fed = 0
        self.emitted = 0

    def feed(self, chunk: np.ndarray) -> np.ndarray:
        """chunk: (B, n) raw samples.  Returns (B, m) denoised samples."""
        if chunk.ndim == 1:
            chunk = chunk[None, :]
        self.fed += chunk.shape[1]
        self.pending = np.concatenate([self.pending, np.asarray(chunk, np.float32)], axis=1)
        outs = []
        fl, ts = self.cfg.frame_length, self.cfg.total_stride
        if self.state is None and self.pending.shape[1] >= fl:
            st, out = self._prime(self.params, jnp.asarray(self.pending[:, :fl]))
            self.state = st
            outs.append(np.asarray(out))
            self.pending = self.pending[:, ts:]
        if self.state is not None:
            # after prime, pending holds >= fl - ts samples of already-seen
            # tail; step whenever a full new stride block is available
            n_frames = max(0, (self.pending.shape[1] - fl) // ts + 1) if self.pending.shape[1] >= fl else 0
            if n_frames == 1:
                new = self.pending[:, fl - ts : fl]
                self.state, out = self._step(self.params, self.state, jnp.asarray(new))
                outs.append(np.asarray(out))
                self.pending = self.pending[:, ts:]
            elif n_frames > 1:
                blocks = np.stack(
                    [self.pending[:, fl - ts + k * ts : fl + k * ts] for k in range(n_frames)]
                )
                self.state, out = self._many(self.params, self.state, jnp.asarray(blocks))
                outs.append(np.asarray(out))
                self.pending = self.pending[:, n_frames * ts :]
        if outs:
            out = np.concatenate(outs, axis=1)
            self.emitted += out.shape[1]
            return out
        return np.zeros((self.batch, 0), np.float32)

    def flush(self) -> np.ndarray:
        """Zero-pad and emit the remaining tail (reference flush :358-368,
        but without resetting the enc/dec caches — strictly closer to the
        offline output than the reference's cache reset)."""
        remaining = self.fed - self.emitted
        if remaining <= 0:
            return np.zeros((self.batch, 0), np.float32)
        pad = self.cfg.frame_length
        out = self.feed(np.zeros((self.batch, pad), np.float32))
        out = out[:, :remaining]
        self.emitted = self.fed
        return out
