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

from typing import Dict, List

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

def _decode_frame(params, cfg, skips, bott_cache, dec_caches, dtype,
                  packs=None, interpret=False):
    """From level-wise skip activations (one frame) to total_stride samples.

    skips[i]: (B, len_i, C_i) full frame output of encoder level i.
    Returns (new_bott_cache, new_dec_caches, out (B, total_stride, 1)).

    packs: optional ``(arrays, meta)`` from
    ops.pallas.stream_fused.pack_stream_params — levels with a non-None
    entry run as ONE fused Pallas kernel (skip-add + mix + GLU + convT +
    overlap-add + tail), identical math to the XLA branch below; the dec
    cache layout (B, S, Cout) is shared by both paths so they interleave
    freely across frames.
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
        pk = packs[1]["dec"][j] if packs is not None else None
        prev = dec_caches[j] if dec_caches is not None else None
        if pk is not None:
            from cleanumamba_tpu.ops.pallas.stream_fused import (
                fused_decoder_level,
            )

            arrays = packs[0]["dec"][j]
            B, T = x.shape[0], x.shape[1]
            Cout = pk["Cout"]
            skip = rev_skips[j][:, :T, :]
            prev_g = prev.reshape(B, 1, S * Cout) if prev is not None else None
            out_g, tail_g = fused_decoder_level(
                x, skip, prev_g, arrays, pk, relu=(j != D - 1),
                compute_dtype=pk["cdt"], interpret=interpret,
            )
            new_dec.append(tail_g.reshape(B, S, Cout).astype(dtype))
            x = out_g.reshape(B, T * S, Cout).astype(dtype)
            continue
        x = x + rev_skips[j][:, : x.shape[1], :]
        # mix + GLU + convT (no relu yet; relu applies after overlap-add)
        x = decoder_level(dp, x, cfg, enc_i, relu=False)
        # cache tail minus bias so the bias isn't double-counted next frame
        tail = x[:, -S:, :] - dp["convt_b"].astype(dtype)
        new_dec.append(tail)
        x = x[:, :-S, :]
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
        # per-SESSION frame counter (B, 1): every state leaf is batch-leading,
        # so a serving multiplexer (serve.py) can splice a freshly-primed
        # session into slot b of a running pool with one tree_map — including
        # the normalization EMA weight 1/n, which must restart at n=2 for the
        # new session while older sessions keep their own counts
        "frames": jnp.ones((B, 1), jnp.int32),
        "enc": enc_caches,
        "dec": dec_caches,
        "bottleneck": bott_cache,
    }
    return state, out


def stream_step(params, cfg: CleanUMambaConfig, state, new_samples,
                dtype=jnp.float32, packs=None, interpret=False):
    """Steady-state step: consume total_stride new raw samples, emit the same.

    new_samples: (B, total_stride).  Returns (state', out (B, total_stride)).

    packs: optional fused-Pallas level packs (see :func:`_decode_frame`);
    packed encoder levels run window-GEMM + ReLU + mix + GLU as one kernel.
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
        suffix = x_prev_full[:, -suffix_len:, :]
        pk = packs[1]["enc"][i] if packs is not None else None
        if pk is not None:
            from cleanumamba_tpu.ops.pallas.stream_fused import (
                encoder_windows,
                fused_encoder_level,
            )

            win = encoder_windows(suffix, K, S)
            new_out = fused_encoder_level(
                win, packs[0]["enc"][i], pk,
                compute_dtype=pk["cdt"], interpret=interpret,
            ).astype(dtype)
        else:
            new_out = encoder_level(ep, suffix, cfg, i)
        x_full = jnp.concatenate([state["enc"][i], new_out], axis=1)
        skips.append(x_full)
        enc_caches.append(x_full[:, strides[i] :, :])
        x_prev_full = x_full

    bott_cache, dec_caches, out = _decode_frame(
        params, cfg, skips, state["bottleneck"], state["dec"], dtype,
        packs=packs, interpret=interpret,
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


def stream_step_mega(cfg: CleanUMambaConfig, state, new_samples, mega,
                     dtype=jnp.float32, interpret=False):
    """Whole-frame step through the single Pallas mega-kernel
    (ops/pallas/stream_mega.py) — semantics identical to
    :func:`stream_step`; only the normalization EMA prologue/epilogue stays
    in XLA.  ``mega``: (arrays, meta) from ``pack_mega``."""
    from cleanumamba_tpu.ops.pallas.stream_mega import mega_stream_step

    arrays, meta = mega
    frame = jnp.concatenate([state["input_tail"], new_samples], axis=1)
    frames = state["frames"] + 1
    if cfg.normalize_input:
        std_now = jnp.std(frame.astype(jnp.float32), axis=1, keepdims=True) + 1e-3
        inv_n = 1.0 / frames.astype(jnp.float32)
        input_std = std_now * inv_n + (1.0 - inv_n) * state["input_std"]
        x = (frame[..., None] / input_std[..., None]).astype(dtype)
    else:
        input_std = state["input_std"]
        x = frame[..., None].astype(dtype)

    upd, out = mega_stream_step(x, state, arrays, meta, interpret=interpret)
    if cfg.normalize_input:
        out = out * input_std.astype(out.dtype)
    new_state = {
        "input_tail": frame[:, cfg.total_stride:],
        "input_std": input_std,
        "frames": frames,
        **upd,
    }
    return new_state, out


def _bottleneck_tokens(params, cfg: CleanUMambaConfig, cache, x,
                       scan_impl: str = "auto"):
    """Run N bottleneck tokens with carried state.  x: (B, N, d_model).

    For the Mamba family this is the chunked selective scan with ``h0`` =
    carried state (the same math that makes block streaming possible: only
    the SSM state is sequential across frames; everything else in the block
    parallelises).  For LSTM/MHA it falls back to a lax.scan of token steps.

    scan_impl: "auto" (Pallas kernel on TPU, XLA chunked scan elsewhere) |
    "pallas" | "xla".  The XLA chunked scan materialises its
    (B, N, d_state, d_inner) fp32 coefficient tensors through HBM — at
    B=1 XLA keeps them fused and the bottleneck hides entirely under the
    encoder/decoder (docs/performance.md block roofline), but at serving
    batch 8 / block 16 they are 67 MB per tensor per layer and the tick
    fell off a cliff (9.9 ms vs 0.63 ms at batch 2 — measured,
    scripts/bench_serve_scaling.py).  The Pallas kernel keeps coefficients
    in VMEM and restores near-linear batch scaling.
    """
    N = x.shape[1]
    if cfg.bottleneck in ("mamba", "mamba2") and N > 1:
        from cleanumamba_tpu.ops.scan import selective_scan

        if scan_impl == "auto":
            from cleanumamba_tpu.ops.pallas.selective_scan import (
                pallas_available,
            )

            scan_impl = "pallas" if pallas_available() else "xla"
        if scan_impl in ("pallas", "pallas_interpret"):
            from cleanumamba_tpu.ops.pallas.selective_scan import (
                pallas_selective_scan,
            )
            interp = scan_impl == "pallas_interpret"

            def scan_fn(xs, dt, A, Bm, Cm, D, h0, chunk):
                return pallas_selective_scan(xs, dt, A, Bm, Cm, D, h0,
                                             chunk=chunk, interpret=interp)
        else:
            scan_fn = selective_scan

        mixer_tokens = (_mamba_mixer_tokens if cfg.bottleneck == "mamba"
                        else _mamba2_mixer_tokens)
        bp = params["bottleneck"]
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
            nc, hidden = mixer_tokens(lp["mixer"], lc, hidden, scan_fn, N)
            new_cache.append(nc)
        residual = hidden.astype(jnp.float32) + residual
        nf = bp["norm_f"]
        if cfg.rms_norm:
            out = rms_norm(residual, nf["scale"], cfg.norm_epsilon)
        else:
            out = layer_norm(residual, nf["scale"], nf["bias"], cfg.norm_epsilon)
        return new_cache, out.astype(x.dtype)

    def tok(cache, x_t):
        cache, y = _bottleneck_step(params, cfg, cache, x_t)
        return cache, y

    cache, ys = jax.lax.scan(tok, cache, jnp.swapaxes(x, 0, 1))
    return cache, jnp.swapaxes(ys, 0, 1)


def _rolling_depthwise_conv(conv_state, xs, conv_w, conv_b, N):
    """Causal depthwise conv over N tokens with carried conv_state (the last
    d_conv inputs).  Returns (pre-activation (B, N, C), new conv_state)."""
    ctx = jnp.concatenate([conv_state[:, 1:, :].astype(xs.dtype), xs], axis=1)
    w = conv_w.astype(xs.dtype)
    acc = jnp.zeros_like(xs)
    for k in range(w.shape[0]):
        acc = acc + ctx[:, k : k + N, :] * w[k]
    return acc + conv_b.astype(xs.dtype), ctx[:, -conv_state.shape[1]:, :]


def _mamba_mixer_tokens(p, lc, hidden, scan_fn, N):
    """N Mamba-1 mixer tokens as one chunked selective scan with h0."""
    from cleanumamba_tpu.models.bottleneck_mamba import mixer_dims

    _, d_inner, d_state, dt_rank, d_conv = mixer_dims(p)
    xz = hidden @ p["in_proj"].astype(hidden.dtype)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]
    pre, new_conv_state = _rolling_depthwise_conv(
        lc["conv_state"], xs, p["conv_w"], p["conv_b"], N)
    xs = jax.nn.silu(pre)
    dbc = xs @ p["x_proj"].astype(xs.dtype)
    dt = dbc[..., :dt_rank]
    Bm = dbc[..., dt_rank : dt_rank + d_state]
    Cm = dbc[..., dt_rank + d_state :]
    dt = dt @ p["dt_proj_w"].astype(dt.dtype) + p["dt_proj_b"].astype(dt.dtype)
    dt = jax.nn.softplus(dt.astype(jnp.float32))
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    y, h_last = scan_fn(xs, dt, A, Bm, Cm, p["D"], lc["ssm_state"], min(32, N))
    y = y * jax.nn.silu(z)
    hidden = y @ p["out_proj"].astype(y.dtype)
    return {"conv_state": new_conv_state, "ssm_state": h_last}, hidden


def _mamba2_mixer_tokens(p, lc, hidden, scan_fn, N):
    """N Mamba-2 (SSD) mixer tokens as one chunked scan with h0.

    Uses the same broadcast-to-elementwise form as mixer_step
    (bottleneck_mamba2.py): the scalar-per-head decay expands to
    A[i, s] = a_head(i // headdim), so the shared selective scan (Pallas
    on TPU) carries the (B, d_inner, d_state) state exactly like the
    per-token step does — block ≡ N steps by construction.
    """
    from cleanumamba_tpu.models.bottleneck_mamba2 import (
        _split_zxbcdt,
        mixer_geometry,
    )
    from cleanumamba_tpu.ops.norms import gated_rms_norm

    _, d_inner, d_state, n_heads, headdim = mixer_geometry(p)
    zxbcdt = hidden @ p["in_proj"].astype(hidden.dtype)
    z, xBC, dt_h = _split_zxbcdt(p, zxbcdt)
    pre, new_conv_state = _rolling_depthwise_conv(
        lc["conv_state"], xBC, p["conv_w"], p["conv_b"], N)
    xBC = jax.nn.silu(pre)
    xs = xBC[..., :d_inner]
    Bm = xBC[..., d_inner : d_inner + d_state]
    Cm = xBC[..., d_inner + d_state :]
    dt_h = jax.nn.softplus(dt_h.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    dt = jnp.repeat(dt_h, headdim, axis=-1)  # (B, N, d_inner)
    A_head = -jnp.exp(p["A_log"].astype(jnp.float32))
    A = jnp.repeat(A_head, headdim)[:, None] * jnp.ones((1, d_state), jnp.float32)
    D = jnp.repeat(p["D"].astype(jnp.float32), headdim)
    y, h_last = scan_fn(xs, dt, A, Bm, Cm, D, lc["ssm_state"], min(32, N))
    y = gated_rms_norm(y, z, p["norm_w"])
    hidden = y @ p["out_proj"].astype(y.dtype)
    return {"conv_state": new_conv_state, "ssm_state": h_last}, hidden


def _stack_strided_frames(window, starts, length):
    """(B, len(starts), length) from static per-frame slices — N static
    lax.slice copies instead of one advanced-indexing gather (TPU gathers
    serialise; static slices fuse, docs/performance.md)."""
    return jnp.stack(
        [jax.lax.slice_in_dim(window, int(s), int(s) + length, axis=1)
         for s in starts], axis=1)


def _blockwise_frame_stds(window, fl, ts, N):
    """Per-frame sliding stds: std of window[:, t*ts : t*ts + fl] for each of
    the N frames in a block.  (B, N, 1), float32."""
    frames = _stack_strided_frames(window.astype(jnp.float32),
                                   [t * ts for t in range(N)], fl)
    return jnp.std(frames, axis=2, keepdims=True) + 1e-3


def _ema_stds(std_now, std0, frames0):
    """Per-frame EMA, identical to N stream_step updates:
    s_t = std_t / n_t + (1 - 1/n_t) * s_{t-1},  n_t = frames0 + t + 1.

    Closed form (the recurrence is linear with known coefficients),
    anchored at frame 0 (whose coef may be exactly 0 on a fresh stream):
    with w_t = prod_{1<=j<=t}(1 - 1/n_j) > 0,
    s_t = w_t * (s_0 + sum_{1<=j<=t} (std_j / n_j) / w_j) — a cumprod and
    a cumsum instead of the N-step sequential lax.scan this replaced (N
    tiny dispatches in the block-streaming hot path).  w_t is O(1) and
    monotone in [coef_1^N, 1]: no over/underflow at any block size.

    std_now: (B, N, 1);  std0: (B, 1);  frames0: (B, 1) per-session counters
    (a scalar broadcasts — legacy states).  Returns (B, N) per-frame EMAs.
    """
    N = std_now.shape[1]
    f0 = jnp.asarray(frames0, jnp.float32)
    if f0.ndim == 0:
        f0 = f0[None, None]
    n_t = f0 + 1.0 + jnp.arange(N, dtype=jnp.float32)  # (B, N)
    coef = 1.0 - 1.0 / n_t  # in [0, 1]; coef_0 = 0 iff fresh stream
    s_first = std_now[:, 0, 0] / n_t[:, 0] + coef[:, 0] * std0[:, 0]  # (B,)
    if N == 1:
        return s_first[:, None]
    # anchored at s_first, all later coefs are > 0 (n_j >= 2): closed form
    w = jnp.cumprod(coef[:, 1:], axis=1)  # (B, N-1) relative products
    terms = (std_now[:, 1:, 0] / n_t[:, 1:]) / w
    rest = w * (s_first[:, None] + jnp.cumsum(terms, axis=1))
    return jnp.concatenate([s_first[:, None], rest], axis=1)  # (B, N)


def stream_step_block(params, cfg: CleanUMambaConfig, state, new_samples,
                      dtype=jnp.float32, scan_impl: str = "auto"):
    """Block streaming: consume N*total_stride new samples, emit the same.

    Math-identical to N successive :func:`stream_step` calls — including
    ``normalize_input``: the std EMA advances per FRAME (reference
    CleanUMamba.py:399-401), each frame's level-0 encoder slice is scaled by
    its own EMA value (suffix windows of consecutive frames overlap by
    kernel_size - stride samples, which are legitimately consumed twice
    under two different stds, exactly as per-frame stepping does), and each
    frame's output is rescaled by its own EMA value.  Levels >= 1 consume
    level-0 OUTPUTS, which are computed exactly once each, so they need no
    per-frame treatment.

    The encoder/decoder work for all N frames runs in parallel and the
    weights are read from HBM once per block instead of once per frame —
    the streaming step is weight-bandwidth-bound (docs/performance.md), so
    throughput scales nearly with N.

    new_samples: (B, N*total_stride).  Returns (state', (B, N*total_stride)).
    """
    K, S, D = cfg.kernel_size, cfg.stride, cfg.encoder_n_layers
    ts = cfg.total_stride
    fl = cfg.frame_length
    N = new_samples.shape[1] // ts
    assert new_samples.shape[1] == N * ts
    strides = _level_strides(cfg)
    window = jnp.concatenate([state["input_tail"], new_samples], axis=1)

    frames = state["frames"] + N
    if cfg.normalize_input:
        std_now = _blockwise_frame_stds(window, fl, ts, N)
        ema = _ema_stds(std_now, state["input_std"], state["frames"])  # (B, N)
        input_std = ema[:, -1:]
    else:
        ema = None
        input_std = state["input_std"]

    skips = []
    enc_caches = []
    if cfg.normalize_input:
        # level 0: per-frame suffix slices, each under its own EMA std
        B = window.shape[0]
        per_frame_len = K + S * (strides[0] - 1)
        slices = _stack_strided_frames(
            window, [fl + t * ts - per_frame_len for t in range(N)],
            per_frame_len)  # (B, N, per_frame_len)
        slices = (slices / ema[..., None]).astype(dtype)
        out0 = encoder_level(
            params["encoder"][0],
            slices.reshape(B * N, per_frame_len, 1), cfg, 0,
        )  # (B*N, strides[0], C0)
        new_out = out0.reshape(B, N * strides[0], -1)
        x_full = jnp.concatenate([state["enc"][0], new_out], axis=1)
        skips.append(x_full)
        enc_caches.append(x_full[:, N * strides[0]:, :])
        x_prev_full = x_full
        level_start = 1
    else:
        x_prev_full = window[..., None].astype(dtype)
        level_start = 0

    for i, ep in list(enumerate(params["encoder"]))[level_start:]:
        n_new = N * strides[i]
        suffix_len = K + S * (n_new - 1)
        new_out = encoder_level(ep, x_prev_full[:, -suffix_len:, :], cfg, i)
        x_full = jnp.concatenate([state["enc"][i], new_out], axis=1)
        skips.append(x_full)
        enc_caches.append(x_full[:, n_new:, :])
        x_prev_full = x_full

    # bottleneck over the N new tokens (skips[-1] has length N: the deepest
    # level's cache is empty)
    z = skips[-1] @ params["tsfm_conv1"]["w"][0].astype(dtype) + params["tsfm_conv1"]["b"].astype(dtype)
    bott_cache, y = _bottleneck_tokens(params, cfg, state["bottleneck"], z,
                                       scan_impl=scan_impl)
    x = y @ params["tsfm_conv2"]["w"][0].astype(dtype) + params["tsfm_conv2"]["b"].astype(dtype)

    new_dec = []
    rev_skips = skips[::-1]
    for j, dp in enumerate(params["decoder"]):
        enc_i = D - 1 - j
        x = x + rev_skips[j][:, : x.shape[1], :]
        x = decoder_level(dp, x, cfg, enc_i, relu=False)
        tail = x[:, -S:, :] - dp["convt_b"].astype(dtype)
        new_dec.append(tail)
        x = x[:, :-S, :]
        prev = state["dec"][j]
        if prev is not None:
            x = x.at[:, :S, :].add(prev)
        if j != D - 1:
            x = jax.nn.relu(x)

    out = x[:, : N * ts, 0]
    if cfg.normalize_input:
        # per-frame rescale by each frame's own EMA value
        out = (out.reshape(out.shape[0], N, ts)
               * ema[..., None].astype(out.dtype)).reshape(out.shape[0], N * ts)

    new_state = {
        "input_tail": window[:, N * ts :],
        "input_std": input_std,
        "frames": frames,
        "enc": enc_caches,
        "dec": new_dec,
        "bottleneck": bott_cache,
    }
    return new_state, out


def stream_many(params, cfg: CleanUMambaConfig, state, blocks, dtype=jnp.float32,
                unroll: int = 1, packs=None, interpret=False):
    """On-device multi-frame streaming: ``lax.scan`` the step over
    (n_frames, B, total_stride) blocks.  Returns (state', (B, n*stride))."""

    def body(st, blk):
        st, out = stream_step(params, cfg, st, blk, dtype,
                              packs=packs, interpret=interpret)
        return st, out

    state, outs = jax.lax.scan(body, state, blocks, unroll=unroll)
    outs = jnp.swapaxes(outs, 0, 1).reshape(blocks.shape[1], -1)
    return state, outs


def prepare_weight_view(params, weights: str, dtype=jnp.float32,
                        quant_min_size: int = 4096):
    """Storage-precision prep shared by Streamer and serve.SessionMultiplexer.

    weights: "fp32" | "bf16" | "int8" — precision of the weight tensors the
    per-frame step streams from HBM (the single-frame latency lever; see
    Streamer).  Returns ``(stored_params, view)`` where ``view(stored)``
    yields the compute-dtype params the step functions consume.
    """
    if weights == "int8":
        from cleanumamba_tpu.quant import dequantize_params, quantize_params

        stored = quantize_params(params, min_size=quant_min_size)
        view = lambda p: dequantize_params(p, dtype)  # noqa: E731
    elif weights == "bf16":
        # Same exclusion as the int8 path (quant._SENSITIVE_KEYS): leave
        # state-dynamics params (A_log etc.) fp32 — their consumers
        # exponentiate and amplify rounding error.
        from cleanumamba_tpu.quant import _SENSITIVE_KEYS

        def _cast(path, x):
            names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
            if (hasattr(x, "dtype") and x.dtype == jnp.float32
                    and x.ndim >= 2 and not names.intersection(_SENSITIVE_KEYS)):
                return x.astype(jnp.bfloat16)
            return x

        stored = jax.tree_util.tree_map_with_path(_cast, params)
        view = lambda p: p  # noqa: E731
    elif weights == "fp32":
        stored = params
        view = lambda p: p  # noqa: E731
    else:
        raise ValueError(f"weights={weights!r}: expected fp32|bf16|int8")
    return stored, view


class Streamer:
    """Host-side convenience wrapper mirroring the reference feed/flush API
    (CleanUMamba.py:358-418): accepts arbitrary-length chunks, internally
    steps the jitted frame functions, returns denoised audio incrementally.
    """

    def __init__(self, params, cfg: CleanUMambaConfig, batch: int = 1,
                 dtype=jnp.float32, weights: str = "fp32",
                 quant_min_size: int = 4096, fused: str | bool = "auto",
                 fused_interpret: bool = False):
        """weights: "fp32" | "bf16" | "int8" — storage precision of the
        weight tensors the per-frame step streams from HBM.  Single-frame
        latency is weight-bandwidth-bound, so this is the latency lever:
        "bf16" halves the traffic, "int8" (per-channel scales, dequantized
        inside the jitted step) halves it again.  State/activation math
        stays in ``dtype``.

        fused: "auto" | "mega" | True | False.  "mega" collapses the ENTIRE
        single-frame step into one whole-frame Pallas kernel
        (ops/pallas/stream_mega.py; raises if the model doesn't pack);
        True collapses each lane-aligned U-Net level into its own kernel
        (ops/pallas/stream_fused.py).  Both cut the per-op dispatch cost
        that dominates block=1 latency.  "auto" = on TPU, prefer the mega
        kernel when the model packs (measured fastest AND most accurate
        on-chip path on every released checkpoint — docs/performance.md),
        falling back to per-level fusion, except int8 which stays on XLA
        (its fused dequant-into-GEMM wins at streaming's tiny GEMM sizes).
        fused_interpret runs the kernels in interpret mode (CPU
        equivalence tests)."""
        self.params, view = prepare_weight_view(
            params, weights, dtype, quant_min_size)
        self.cfg = cfg
        self.dtype = dtype
        self.batch = batch
        self._pack_arrays = None
        pack_meta = None
        mega_meta = None
        cdt = jnp.float32 if weights == "fp32" else jnp.bfloat16
        if fused == "auto":
            from cleanumamba_tpu.ops.pallas.selective_scan import pallas_available

            # int8 stays on the XLA path: its fused dequant-into-GEMM beats
            # the kernels' in-register dequant at streaming's tiny GEMM
            # sizes (measured, docs/performance.md block=1 table).
            fused = pallas_available() and weights != "int8"
            if fused:
                # Prefer the whole-frame mega kernel when the model packs:
                # fastest AND most accurate on-chip block=1 path on every
                # released checkpoint (docs/performance.md).
                from cleanumamba_tpu.ops.pallas.stream_mega import pack_mega

                mega = pack_mega(view(self.params), cfg, cdt)
                if mega is not None:
                    fused = "mega"
                    self._pack_arrays, mega_meta = mega
        if fused == "mega" and mega_meta is None:
            # Whole-frame single-kernel path (small released models; see
            # ops/pallas/stream_mega.py).  Packs from the dense view so
            # int8/bf16 storage modes work too.
            from cleanumamba_tpu.ops.pallas.stream_mega import pack_mega

            mega = pack_mega(view(self.params), cfg, cdt)
            if mega is None:
                raise ValueError(
                    "fused='mega': model does not meet the mega-kernel's "
                    "static constraints (see pack_mega)")
            self._pack_arrays, mega_meta = mega
        elif fused and fused != "mega":
            from cleanumamba_tpu.ops.pallas.stream_fused import pack_stream_params

            # Measured policy (docs/performance.md block=1 table): fp32 fuses
            # every level that fits VMEM (XLA's fp32 smalls are slowest);
            # bf16 fuses only dispatch-bound small levels — XLA already wins
            # the big GEMMs at bf16.
            budget = (10 if weights == "fp32" else 1) * 1024 * 1024
            self._pack_arrays, pack_meta = pack_stream_params(
                self.params, cfg, cdt, budget=budget)
        # resolved single-frame path, for introspection/tests:
        # "mega" (whole-frame kernel) | "fused" (per-level kernels) | "xla"
        self.fused_mode = ("mega" if mega_meta is not None
                           else "fused" if pack_meta is not None else "xla")
        self._prime = jax.jit(lambda p, f: stream_prime(view(p), cfg, f, dtype))
        if mega_meta is not None:
            self._step = jax.jit(
                lambda p, s, n, pa: stream_step_mega(
                    cfg, s, n, (pa, mega_meta), dtype,
                    interpret=fused_interpret,
                )
            )
        else:
            self._step = jax.jit(
                lambda p, s, n, pa: stream_step(
                    view(p), cfg, s, n, dtype,
                    packs=(pa, pack_meta) if pack_meta is not None else None,
                    interpret=fused_interpret,
                )
            )
        # block step: all frames available in a feed() run as ONE parallel
        # block (weights read once per block, not once per frame) — see
        # stream_step_block / docs/performance.md
        self._block = jax.jit(lambda p, s, n: stream_step_block(view(p), cfg, s, n, dtype))
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
                self.state, out = self._step(
                    self.params, self.state, jnp.asarray(new), self._pack_arrays)
                outs.append(np.asarray(out))
                self.pending = self.pending[:, ts:]
            elif n_frames > 1:
                new = self.pending[:, fl - ts : fl + (n_frames - 1) * ts]
                self.state, out = self._block(self.params, self.state, jnp.asarray(new))
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
