"""Exact sequence parallelism: one long waveform denoised across a mesh.

No reference equivalent (the reference handles long audio by streaming on a
single device); this is a TPU-native scaling feature: the TIME axis of one
utterance is sharded over the mesh's devices, and the result is EXACTLY the
single-device streaming output (zero-primed; see below), to float tolerance.

How each piece of sequential state crosses the segment boundary:

- **Raw context** (encoder receptive field + bottleneck-conv warmup): a
  single `ppermute` of the last ``frame_length + 2*total_stride`` raw
  samples.  Everything the encoder needs is then LOCAL — convolutions have
  finite lookback, so each device recomputes its boundary context from raw
  samples instead of receiving activations.
- **SSM state** (the only truly sequential recurrence): closed-form segment
  composition.  Over a segment, ``prod_t exp(dt_t·A) = exp(A·Σdt)``, so each
  device publishes its segment transition ``A_seg`` and zero-state response
  ``h_loc`` (one tiny all_gather of (B, d_inner, d_state) pairs per layer);
  every device folds the prefix to get its incoming state ``h0`` and adds
  the h0-response ``y_corr_t = Σ_s C_ts · exp(A·cumsum(dt)_t) ⊙ h0`` to its
  local scan output.  Layers are corrected in order (layer l+1 consumes
  layer l's corrected stream), so a 3-layer bottleneck costs 3 all_gathers
  plus one 3-token `ppermute` per layer for the conv-warmup context.
- **Decoder overlap-add tails**: absorbed, not communicated.  Each device
  decodes its 3 warmup tokens too and drops the first ``3*total_stride``
  output samples; a missing boundary tail only corrupts the first
  ``Σ_k S^k < 2·total_stride`` samples of a block's decode, which lie
  entirely inside the dropped region.

- **Input normalization** (``normalize_input=True``, the released
  checkpoints' default): the per-frame running-std EMA is a global scalar
  recurrence — each device computes its own frames' stds locally (the halo
  covers each frame's lookback window), ONE all_gather of (B, N) scalars
  builds the identical global EMA table everywhere, level 0 is recomputed
  frame-sliced under each frame's own EMA (2 extra history frames; device
  0's stream-initial frame is rebuilt PRIME-style and where()-selected),
  and outputs rescale per frame.

Semantics: the output equals streaming [zeros(ctx) | x] through
stream_prime/stream_step_block on ONE device (``ctx = frame_length +
2*total_stride`` — the stream is "zero-primed": it warms up on silence
instead of seeing future context), with outputs aligned back to x.
Supported bottlenecks: "mamba", "mamba2" and "mamba_s4" — every SSM family.
mamba2's per-head scalar decay broadcasts into the same exp(A·Σdt)
composition; mamba_s4's transition is input-independent, so its segment
composition is the constant dense matrix power ``dA^T`` (repeated squaring)
on the streaming step's own discrete system (_sp_mixer_s4).  MHA (its sliding
KV window can span many segments) and LSTM (nonlinear recurrence) stay
single-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import decoder_level, encoder_level
from cleanumamba_tpu.models.bottleneck_mamba import mixer_dims
from cleanumamba_tpu.ops.norms import layer_norm, rms_norm
from cleanumamba_tpu.ops.scan import selective_scan
from cleanumamba_tpu.streaming import _ema_stds, _level_lengths, _level_strides

_WARM = 3  # bottleneck conv warmup tokens carried across the boundary (d_conv - 1)


def _pperm_right(x, axis_name, n_dev):
    """Send to the right neighbor; device 0 receives zeros."""
    return jax.lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n_dev - 1)])


def _h0_response(dt_mine, C_mine, A, h0, chunk: int = 32):
    """y_corr[t] = Σ_s C[t,s] · exp(A[:,s]·cd_t) ⊙ h0[:,s]   (cd inclusive).

    dt (B,T,d_inner) fp32, C (B,T,d_state), A (d_inner,d_state),
    h0 (B,d_inner,d_state) -> (B,T,d_inner) fp32.  Chunked so the
    (chunk, d_state, d_inner) exponential tensor stays small."""
    Bz, T, d_inner = dt_mine.shape
    cd = jnp.cumsum(dt_mine.astype(jnp.float32), axis=1)
    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    if pad:
        cd = jnp.pad(cd, ((0, 0), (0, pad), (0, 0)))
        C_mine = jnp.pad(C_mine, ((0, 0), (0, pad), (0, 0)))
    At = A.astype(jnp.float32).T  # (d_state, d_inner)
    h0_t = h0.astype(jnp.float32).swapaxes(-1, -2)  # (B, d_state, d_inner)

    def chunks(x):
        return x.reshape(Bz, n_chunks, chunk, -1).swapaxes(0, 1)

    def body(_, inp):
        cdc, Cc = inp  # (B, c, d_inner), (B, c, d_state)
        e = jnp.exp(cdc[:, :, None, :] * At[None, None])  # (B,c,s,i)
        y = jnp.einsum("bcsi,bcs->bci", e * h0_t[:, None],
                       Cc.astype(jnp.float32))
        return 0, y

    _, ys = jax.lax.scan(body, 0, (chunks(cd), chunks(C_mine)))
    return ys.swapaxes(0, 1).reshape(Bz, n_chunks * chunk, d_inner)[:, :T]


def _zero_padded_conv(xs_e, conv_w, conv_b):
    """Causal depthwise conv over the extended token sequence (zero left-pad:
    exactly the zero conv_state a fresh stream starts with)."""
    K = conv_w.shape[0]
    ctx = jnp.pad(xs_e, ((0, 0), (K - 1, 0), (0, 0)))
    acc = jnp.zeros_like(xs_e)
    for k in range(K):
        acc = acc + ctx[:, k : k + xs_e.shape[1], :] * conv_w[k].astype(xs_e.dtype)
    return jax.nn.silu(acc + conv_b.astype(xs_e.dtype))


def _sp_scan_core(xs_e, dt_e, B_e, C_e, A, D, axis_name, n_dev, idx, chunk):
    """Cross-device selective scan over [warm | mine] tokens.

    Shared by the mamba and mamba2 mixers (mamba2 enters here with its
    per-head scalar decay broadcast to (d_inner, d_state) — the composition
    below is decay-shape agnostic).  Returns (y_mine, y_warm) fp32 where
    y_mine includes the cross-device h0 correction.

    Segment composition: over a segment ``prod_t exp(dt_t*A) = exp(A*Σdt)``,
    so each device publishes its segment transition A_seg and zero-state
    response h_loc (one all_gather); every device folds the prefix to get
    its incoming state h0 and adds the h0 response to its local output.
    Device 0's published segment includes its zero-region warm tokens (no
    one else scans them)."""
    w = _WARM
    xs_w, dt_w, B_w, C_w = xs_e[:, :w], dt_e[:, :w], B_e[:, :w], C_e[:, :w]
    xs_m, dt_m, B_m, C_m = xs_e[:, w:], dt_e[:, w:], B_e[:, w:], C_e[:, w:]

    # local zero-state scans: mine (for outputs + segment response) and the
    # warm tokens (device 0's true incoming state; also its warm outputs)
    y0, h_loc = selective_scan(xs_m, dt_m, A, B_m, C_m, D, h0=None,
                               chunk=chunk)
    y_w, h_pre = selective_scan(xs_w, dt_w, A, B_w, C_w, D, h0=None,
                                chunk=w)

    def seg_A(dt_part):
        return jnp.exp(A[None] * jnp.sum(dt_part, axis=1)[..., None])

    A_m, A_w = seg_A(dt_m), seg_A(dt_w)
    is0 = (idx == 0)
    pub_A = jnp.where(is0, A_w * A_m, A_m)
    pub_h = jnp.where(is0, A_m * h_pre + h_loc, h_loc)

    segs_A = jax.lax.all_gather(pub_A, axis_name)  # (n_dev, B, i, s)
    segs_h = jax.lax.all_gather(pub_h, axis_name)
    h0 = jnp.zeros_like(h_loc)
    prefixes = []
    for k in range(n_dev):
        prefixes.append(h0)
        h0 = segs_A[k] * h0 + segs_h[k]
    h0_mine = jnp.take(jnp.stack(prefixes), idx, axis=0)
    h0_mine = jnp.where(is0, h_pre, h0_mine)

    y = y0.astype(jnp.float32) + _h0_response(dt_m, C_m, A, h0_mine, chunk)
    return y, y_w.astype(jnp.float32)


def _cpair(x):
    """complex -> (..., 2) real pair (complex arrays do not ride the axon
    relay's collectives / jit boundary reliably; pairs always do)."""
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)


def _cunpair(x):
    return x[..., 0] + 1j * x[..., 1]


def _s4_scan(dA, dB, dC, u, s0):
    """Sequential constant-coefficient SSM, exactly the streaming step's
    recurrence (models/bottleneck_s4.py::mixer_step): ``s_t = dA s_{t-1} +
    dB u_t``, ``y_t = Re(dC s_t)``.  u (B,T,H) fp32, s0 (B,H,N) complex64.
    Returns (y (B,T,H) fp32, s_T)."""
    def body(s, u_t):  # u_t (B, H)
        s = jnp.einsum("hmn,bhn->bhm", dA, s) + \
            dB[None] * u_t[..., None].astype(jnp.complex64)
        y = jnp.einsum("chn,bhn->bch", dC, s).real[:, 0]
        return s, y

    s, ys = jax.lax.scan(body, s0, u.swapaxes(0, 1))
    return ys.swapaxes(0, 1), s


def _s4_mat_power(dA, T: int):
    """dA^T per feature, repeated squaring (T is a static Python int)."""
    H, N, _ = dA.shape
    out = jnp.broadcast_to(jnp.eye(N, dtype=dA.dtype)[None], dA.shape)
    base = dA
    while T:
        if T & 1:
            out = jnp.einsum("hmn,hnk->hmk", base, out)
        base = jnp.einsum("hmn,hnk->hmk", base, base)
        T >>= 1
    return out


def _sp_s4_core(u_e, sys, axis_name, n_dev, idx, chunk):
    """Cross-device constant-coefficient SSM over [warm | mine] inputs.

    u_e (B, WARM+T, H) real.  Returns (y_mine, y_warm) fp32 = Re(dC s)
    WITHOUT the D skip (caller adds it).  Same composition scheme as
    _sp_scan_core, but the transition is input-independent, so the
    published segment transition is the constant dense ``dA^T`` (``dA^{W+T}``
    on device 0; repeated squaring) and the incoming state folds with
    n_dev dense matvecs.  The dense form is kept deliberately —
    models/bottleneck_s4.py::sp_discrete_system documents why
    diagonalizing it is numerically unusable at fp32."""
    w = _WARM
    dA = _cunpair(sys["dA"])      # (H, N, N)
    dB = _cunpair(sys["dB"])      # (H, N)
    dC = _cunpair(sys["dC"])      # (1, H, N)
    u_w = u_e[:, :w].astype(jnp.float32)
    u_m = u_e[:, w:].astype(jnp.float32)
    Bz, T, H = u_m.shape
    s0 = jnp.zeros((Bz, H, dA.shape[-1]), jnp.complex64)

    y0_w, h_pre = _s4_scan(dA, dB, dC, u_w, s0)
    _, h_loc = _s4_scan(dA, dB, dC, u_m, s0)

    AT = _s4_mat_power(dA, T)
    ATW = jnp.einsum("hmn,hnk->hmk", AT, _s4_mat_power(dA, w))
    is0 = (idx == 0)
    pub_A = jnp.where(is0, ATW, AT)  # (H, N, N)
    pub_h = jnp.where(
        is0, jnp.einsum("hmn,bhn->bhm", AT, h_pre) + h_loc, h_loc)

    segs_A = _cunpair(jax.lax.all_gather(_cpair(pub_A), axis_name))
    segs_h = _cunpair(jax.lax.all_gather(_cpair(pub_h), axis_name))
    h0 = jnp.zeros_like(h_loc)
    prefixes = []
    for kdev in range(n_dev):
        prefixes.append(h0)
        h0 = jnp.einsum("hmn,bhn->bhm", segs_A[kdev], h0) + segs_h[kdev]
    h0_mine = jnp.take(jnp.stack(prefixes), idx, axis=0)
    h0_mine = jnp.where(is0, h_pre, h0_mine)

    y_m, _ = _s4_scan(dA, dB, dC, u_m, h0_mine)
    return y_m, y0_w


def _sp_mixer_s4(p, hidden_ext, axis_name, n_dev, idx, chunk, sys):
    """One MambaS4 mixer over [warm | mine] tokens with cross-device state.

    Mirrors models/bottleneck_s4.py::mixer_step exactly: in_proj split ->
    causal conv + SiLU -> input_linear -> linear SSM (+D skip) -> GELU ->
    output_linear + GLU -> z-gate -> out_proj; only the linear SSM stage
    crosses the device boundary (everything else is token-local).
    sys: the replicated discrete system from sp_discrete_system."""
    d_inner = p["conv_w"].shape[1]
    x = hidden_ext
    xz = x @ p["in_proj"].astype(x.dtype)
    xs_e, z_e = xz[..., :d_inner], xz[..., d_inner:]
    xs_e = _zero_padded_conv(xs_e, p["conv_w"], p["conv_b"])
    u_e = xs_e @ p["input_linear_w"].astype(xs_e.dtype) + \
        p["input_linear_b"].astype(xs_e.dtype)

    w = _WARM
    y_m, y_w = _sp_s4_core(u_e, sys, axis_name, n_dev, idx, chunk)
    D = p["ssm_D"].astype(jnp.float32)[0]  # (H,), C=1

    def tail(y_lin, u_part, z_part):
        y = y_lin + u_part.astype(jnp.float32) * D[None, None]
        y = jax.nn.gelu(y.astype(x.dtype), approximate=False)
        y = y @ p["output_linear_w"].astype(x.dtype) + \
            p["output_linear_b"].astype(x.dtype)
        half = y.shape[-1] // 2
        y = y[..., :half] * jax.nn.sigmoid(y[..., half:])
        y = y * jax.nn.silu(z_part)
        return y @ p["out_proj"].astype(y.dtype)

    return tail(y_m, u_e[:, w:], z_e[:, w:]), tail(y_w, u_e[:, :w], z_e[:, :w])


def _sp_mixer(p, hidden_ext, axis_name, n_dev, idx, chunk):
    """One Mamba mixer over [warm | mine] tokens with cross-device h0.

    hidden_ext: (B, WARM + N, d_model).  Returns (out_mine (B, N, d_model),
    warm_out_local (B, WARM, d_model) — the k==0 warm outputs)."""
    _, d_inner, d_state, dt_rank, d_conv = mixer_dims(p)
    x = hidden_ext
    xz = x @ p["in_proj"].astype(x.dtype)
    xs_e, z_e = xz[..., :d_inner], xz[..., d_inner:]
    xs_e = _zero_padded_conv(xs_e, p["conv_w"], p["conv_b"])
    dbc = xs_e @ p["x_proj"].astype(xs_e.dtype)
    dt_e = dbc[..., :dt_rank] @ p["dt_proj_w"].astype(x.dtype) + p["dt_proj_b"].astype(x.dtype)
    dt_e = jax.nn.softplus(dt_e.astype(jnp.float32))
    B_e = dbc[..., dt_rank : dt_rank + d_state]
    C_e = dbc[..., dt_rank + d_state :]
    A = -jnp.exp(p["A_log"].astype(jnp.float32))

    w = _WARM
    y, y_w = _sp_scan_core(xs_e, dt_e, B_e, C_e, A, p["D"],
                           axis_name, n_dev, idx, chunk)
    y = y.astype(x.dtype) * jax.nn.silu(z_e[:, w:])
    out_mine = y @ p["out_proj"].astype(y.dtype)
    y_warm = y_w.astype(x.dtype) * jax.nn.silu(z_e[:, :w])
    warm_out_local = y_warm @ p["out_proj"].astype(y_warm.dtype)
    return out_mine, warm_out_local


def _sp_mixer2(p, hidden_ext, axis_name, n_dev, idx, chunk):
    """Mamba2 (SSD) mixer over [warm | mine] tokens with cross-device h0.

    The per-head scalar decay is broadcast to the (d_inner, d_state)
    elementwise form (models/bottleneck_mamba2.py mixer_step does the same),
    so the segment composition is byte-identical machinery to mamba1 —
    ``exp(a_head*Σdt)`` composes the same closed form."""
    from cleanumamba_tpu.models.bottleneck_mamba2 import (
        _split_zxbcdt,
        mixer_geometry,
    )
    from cleanumamba_tpu.ops.norms import gated_rms_norm

    _, d_inner, d_state, n_heads, headdim = mixer_geometry(p)
    x = hidden_ext
    zxbcdt = x @ p["in_proj"].astype(x.dtype)
    z_e, xBC, dt_h = _split_zxbcdt(p, zxbcdt)
    xBC = _zero_padded_conv(xBC, p["conv_w"], p["conv_b"])
    xs_e = xBC[..., :d_inner]
    B_e = xBC[..., d_inner : d_inner + d_state]
    C_e = xBC[..., d_inner + d_state :]
    dt_h = jax.nn.softplus(dt_h.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    dt_e = jnp.repeat(dt_h, headdim, axis=-1)  # (B, T, d_inner)
    A_head = -jnp.exp(p["A_log"].astype(jnp.float32))
    A = jnp.repeat(A_head, headdim)[:, None] * jnp.ones((1, d_state), jnp.float32)
    D = jnp.repeat(p["D"].astype(jnp.float32), headdim)

    w = _WARM
    y, y_w = _sp_scan_core(xs_e, dt_e, B_e, C_e, A, D,
                           axis_name, n_dev, idx, chunk)
    y = gated_rms_norm(y.astype(x.dtype), z_e[:, w:], p["norm_w"])
    out_mine = y @ p["out_proj"].astype(y.dtype)
    y_warm = gated_rms_norm(y_w.astype(x.dtype), z_e[:, :w], p["norm_w"])
    warm_out_local = y_warm @ p["out_proj"].astype(y_warm.dtype)
    return out_mine, warm_out_local


def _ema_table(window, cfg, axis_name, N, off):
    """Global per-frame normalization EMA, identical on every device.

    Each device computes the stds of ITS N frames (full fl windows — the
    halo covers the lookback); the stream's 3 zero-region warm frames have
    std exactly 1e-3 (std of zeros + the streaming floor).  One all_gather
    of (B, N) scalars, then the sequential 1/n-weighted EMA fold
    (streaming._ema_stds semantics with global frame indices)."""
    ts, fl = cfg.total_stride, cfg.frame_length
    # window leads the padded stream by `off` phantom samples;
    # my mine frames are u = WARM..WARM+N-1 in window coords
    idx = (jnp.arange(N)[:, None] + _WARM) * ts + off + jnp.arange(fl)[None, :]
    frames = window.astype(jnp.float32)[:, idx]  # (B, N, fl) one gather
    stds = jnp.std(frames, axis=2) + 1e-3  # (B, N)
    all_stds = jax.lax.all_gather(stds, axis_name)  # (n_dev, B, N)
    B = stds.shape[0]
    flat = jnp.moveaxis(all_stds, 0, 1).reshape(B, -1)  # (B, n_dev*N)
    warm0 = jnp.full((B, _WARM), 1e-3, jnp.float32)
    all_f = jnp.concatenate([warm0, flat], axis=1)  # (B, 3 + n*N) global stds
    # streaming's per-frame EMA fold, seeded at the stream start
    return _ema_stds(all_f[..., None], jnp.zeros((B, 1), jnp.float32),
                     jnp.zeros((), jnp.int32))  # (B, 3 + n*N)


def _level0_normalized(params, cfg, window, ema, idx, N, dtype, off):
    """Level-0 buffer under per-frame input normalization, stream-exact.

    Step-style: each frame contributes strides[0] outputs from its
    end-aligned per_frame_len slice divided by ITS EMA
    (stream_step_block's normalize branch).  The buffer for an (N+WARM)
    block needs 2 extra history frames; device 0's history predates the
    stream, where frame 0 was computed PRIME-style (the whole first frame
    normalized by std_0) — both variants are built and where()-selected.
    """
    K, S = cfg.kernel_size, cfg.stride
    ts, fl = cfg.total_stride, cfg.frame_length
    s0 = S ** (cfg.encoder_n_layers - 1)
    lens0 = (fl - K) // S + 1
    pfl = K + S * (s0 - 1)  # per-frame slice length
    B = window.shape[0]
    n_fr = N + _WARM + 2  # history(2) + warm(3) + mine(N)
    need = lens0 + (N + _WARM - 1) * s0

    # EMAs for my n_fr frames: global indices idx*N - 2 + [0..n_fr); pad the
    # table with 2 leading entries for device 0's phantom history (its
    # history outputs are discarded by the prime-variant select)
    table = jnp.concatenate([jnp.ones((B, 2), jnp.float32), ema], axis=1)
    e_hist = jax.lax.dynamic_slice_in_dim(table, idx * N, n_fr, axis=1)

    starts = (jnp.arange(-2, N + _WARM)[:, None] * ts + fl - pfl + off)
    slices = window[:, starts + jnp.arange(pfl)[None, :]]  # one gather
    slices = (slices / e_hist[..., None]).astype(dtype)
    out = encoder_level(params["encoder"][0],
                        slices.reshape(B * n_fr, pfl, 1), cfg, 0)
    step_buf = out.reshape(B, n_fr * s0, -1)[:, -need:]

    # device 0: prime-style frame 0 (global frame 0 = the zero-region prime)
    frame0 = window[:, off : off + fl] / ema[:, :1]
    prime0 = encoder_level(params["encoder"][0],
                           frame0[..., None].astype(dtype), cfg, 0)
    steps0 = out.reshape(B, n_fr, s0, -1)[:, 3:]  # frames u=1..N+WARM-1
    prime_buf = jnp.concatenate(
        [prime0, steps0.reshape(B, (n_fr - 3) * s0, -1)], axis=1
    )
    assert prime_buf.shape[1] == need, (prime_buf.shape, need)
    return jnp.where((idx == 0), prime_buf, step_buf)


def _sp_shard(params, cfg: CleanUMambaConfig, x_local, axis_name, n_dev,
              dtype, chunk, extras=()):
    """Per-device program (inside shard_map).  x_local: (B, N*ts) raw.

    extras: per-layer replicated side data (mamba_s4: the diagonalized
    discrete systems from sp_diagonal_system; empty otherwise)."""
    K, S, D = cfg.kernel_size, cfg.stride, cfg.encoder_n_layers
    ts, fl = cfg.total_stride, cfg.frame_length
    N = x_local.shape[1] // ts
    idx = jax.lax.axis_index(axis_name)
    # halo: encoder receptive field + bottleneck warmup, plus enough extra
    # raw samples that the 2 history frames' normalized level-0 slices fit
    s0 = S ** (D - 1)
    pfl = K + S * (s0 - 1)
    extra = max(0, 2 * ts + pfl - fl)
    ctx_len = fl + (_WARM - 1) * ts + extra

    halo = _pperm_right(x_local[:, -ctx_len:], axis_name, n_dev)
    window = jnp.concatenate([halo, x_local], axis=1)

    # encoder; level i yields the stream-equivalent [cache | new] buffer for
    # a (N + WARM)-frame block (slice-from-end: the K-S extra raw context
    # adds leading outputs)
    lens = _level_lengths(cfg)
    strides = _level_strides(cfg)
    skips = []
    if cfg.normalize_input:
        ema = _ema_table(window, cfg, axis_name, N, extra)
        xx = _level0_normalized(params, cfg, window, ema, idx, N, dtype, extra)
        skips.append(xx)
        start = 1
    else:
        xx = window[..., None].astype(dtype)
        start = 0
    for i, ep in list(enumerate(params["encoder"]))[start:]:
        expected = lens[i] + (N + _WARM - 1) * strides[i]
        xx = encoder_level(ep, xx, cfg, i)[:, -expected:]
        skips.append(xx)
    tokens_ext = skips[-1]  # (B, N + WARM, C_last)
    assert tokens_ext.shape[1] == N + _WARM, tokens_ext.shape

    z_ext = tokens_ext @ params["tsfm_conv1"]["w"][0].astype(dtype) + \
        params["tsfm_conv1"]["b"].astype(dtype)

    # bottleneck: residual stream over [warm | mine]; warm context comes
    # from the right-ppermuted corrected neighbor values each layer
    # (device 0 keeps its locally-exact zero-region values)
    bp = params["bottleneck"]
    w = _WARM
    hid_m, res_m = z_ext[:, w:], jnp.zeros(z_ext[:, w:].shape, jnp.float32)
    hid_w, res_w = z_ext[:, :w], jnp.zeros(z_ext[:, :w].shape, jnp.float32)
    eps = cfg.norm_epsilon
    for li, lp in enumerate(bp["layers"]):
        res_ext = jnp.concatenate([res_w, res_m], axis=1) + \
            jnp.concatenate([hid_w, hid_m], axis=1).astype(jnp.float32)
        if cfg.rms_norm:
            hidden_ext = rms_norm(res_ext, lp["norm"]["scale"], eps)
        else:
            hidden_ext = layer_norm(res_ext, lp["norm"]["scale"],
                                    lp["norm"]["bias"], eps)
        hidden_ext = hidden_ext.astype(dtype)
        if cfg.bottleneck == "mamba_s4":
            out_m, warm_local = _sp_mixer_s4(lp["mixer"], hidden_ext,
                                             axis_name, n_dev, idx, chunk,
                                             extras[li])
        else:
            mixer_fn = _sp_mixer2 if cfg.bottleneck == "mamba2" else _sp_mixer
            out_m, warm_local = mixer_fn(lp["mixer"], hidden_ext, axis_name,
                                         n_dev, idx, chunk)
        res_m = res_ext[:, w:]
        res_w_next = _pperm_right(res_m[:, -w:], axis_name, n_dev)
        hid_w_next = _pperm_right(out_m[:, -w:], axis_name, n_dev)
        is0 = (idx == 0)
        res_w = jnp.where(is0, res_ext[:, :w], res_w_next)
        hid_w = jnp.where(is0, warm_local, hid_w_next)
        hid_m = out_m
    res_ext = jnp.concatenate([res_w, res_m], axis=1) + \
        jnp.concatenate([hid_w, hid_m], axis=1).astype(jnp.float32)
    nf = bp["norm_f"]
    if cfg.rms_norm:
        tokens_out = rms_norm(res_ext, nf["scale"], eps)
    else:
        tokens_out = layer_norm(res_ext, nf["scale"], nf["bias"], eps)
    tokens_out = tokens_out.astype(dtype)

    # decoder over all N + WARM tokens; the dropped warm region absorbs the
    # missing cross-boundary overlap-add tails (error region < 2*ts < w*ts)
    xx = tokens_out @ params["tsfm_conv2"]["w"][0].astype(dtype) + \
        params["tsfm_conv2"]["b"].astype(dtype)
    rev_skips = skips[::-1]
    for j, dp in enumerate(params["decoder"]):
        xx = xx + rev_skips[j][:, : xx.shape[1], :]
        xx = decoder_level(dp, xx, cfg, D - 1 - j, relu=False)
        xx = xx[:, :-S, :]
        if j != D - 1:
            xx = jax.nn.relu(xx)
    out = xx[:, w * ts : (N + w) * ts, 0]
    if cfg.normalize_input:
        e_mine = jax.lax.dynamic_slice_in_dim(ema, _WARM + idx * N, N, axis=1)
        out = (out.reshape(out.shape[0], N, ts)
               * e_mine[..., None].astype(out.dtype)).reshape(out.shape[0], N * ts)
    return out


def sp_stream_denoise(params, cfg: CleanUMambaConfig, x, mesh: Mesh,
                      axis_name: str = "data", dtype=jnp.float32,
                      chunk: int = 32):
    """Denoise (B, L) waveforms with the time axis sharded over ``mesh``.

    Output matches single-device zero-primed streaming of the same signal
    (see module docstring), aligned to x; the tail shorter than the model
    lookahead is zero-padded internally exactly like ``Streamer.flush``.
    """
    if cfg.bottleneck not in ("mamba", "mamba2", "mamba_s4"):
        raise NotImplementedError(
            "sequence parallelism: mamba/mamba2/mamba_s4 bottlenecks only "
            "(MHA's sliding KV window can span many segments and LSTM's "
            "nonlinear recurrence has no closed-form segment transition)")
    extras = ()
    if cfg.bottleneck == "mamba_s4":
        from cleanumamba_tpu.models.bottleneck_s4 import sp_discrete_system

        # host-side, once per call: diagonalize each layer's constant
        # discrete transition so the shard program's composition is
        # elementwise (complex data rides as real pairs)
        extras = tuple(sp_discrete_system(lp["mixer"])
                       for lp in params["bottleneck"]["layers"])
    for lp in params["bottleneck"]["layers"]:
        d_conv = lp["mixer"]["conv_w"].shape[0]
        if d_conv - 1 > _WARM:
            raise NotImplementedError(
                f"d_conv={d_conv} needs {d_conv - 1} warm tokens; "
                f"sequence parallelism carries {_WARM}"
            )
    ts, fl = cfg.total_stride, cfg.frame_length
    K, S, D = cfg.kernel_size, cfg.stride, cfg.encoder_n_layers
    n_dev = mesh.devices.size
    B, L = x.shape
    # right-pad so every output position of x is covered (lookahead fl - ts)
    # and the padded length splits evenly into n_dev * k * ts
    need = L + (fl - ts)
    unit = n_dev * ts
    total = -(-need // unit) * unit
    # each device's segment must cover the halo it sends right
    pfl = K + S * (S ** (D - 1) - 1)
    ctx_len = fl + (_WARM - 1) * ts + max(0, 2 * ts + pfl - fl)
    per_dev = total // n_dev
    min_per_dev = max(-(-ctx_len // ts) * ts, _WARM * ts)
    if per_dev < min_per_dev:
        # short input: pad up so every device still covers the halo it
        # sends right (the extra zero frames are sliced away below)
        total = n_dev * min_per_dev
    xp = jnp.pad(jnp.asarray(x, jnp.float32), ((0, 0), (0, total - L)))

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        lambda p, xl, ex: _sp_shard(p, cfg, xl, axis_name, n_dev, dtype,
                                    chunk, ex),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P()),
        out_specs=P(None, axis_name),
        check_rep=False,
    )
    y = fn(params, xp, extras)  # positions [w*ts, w*ts + total) of the padded stream
    # x's outputs sit fl - ts later than the block start (zero-prime offset)
    return y[:, fl - ts : fl - ts + L]
