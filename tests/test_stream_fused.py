"""Fused Pallas streaming-level kernels ≡ the XLA per-op path.

The fused kernels (ops/pallas/stream_fused.py) collapse each lane-aligned
U-Net level of the single-frame streaming step into one pallas_call; the
math must be bit-for-bit the XLA path's (same contraction order, same
overlap-add/bias/tail bookkeeping — reference semantics
CleanUMamba.py:420-484).  CPU tests run the kernels in interpret mode;
scripts/bench_zoo.py + tests on the chip cover the compiled path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import (
    decoder_level,
    encoder_level,
    forward,
    init_params,
)
from cleanumamba_tpu.ops.pallas.stream_fused import (
    encoder_windows,
    fused_decoder_level,
    fused_encoder_level,
    pack_decoder_level,
    pack_encoder_level,
    pack_stream_params,
)
from cleanumamba_tpu.streaming import Streamer

CFG = CleanUMambaConfig(
    channels_H=128, max_H=256, encoder_n_layers=3,
    tsfm_n_head=4, tsfm_d_model=64, tsfm_d_inner=128,
    normalize_input=False,  # so streaming ≡ offline exactly (reference :570)
)


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.3


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_pack_applicability(params):
    """Every level of the released geometry (bypass=0, K=2S, groups=1)
    packs — including ragged/non-128 channel counts (the kernels never
    lane-slice, so Mosaic's internal padding handles any width)."""
    arrays, meta = pack_stream_params(params, CFG, jnp.float32)
    assert all(m is not None for m in meta["enc"])
    assert all(m is not None for m in meta["dec"])


def test_streamer_auto_policy(params, monkeypatch):
    """The measured default policy (docs/performance.md block=1 table):
    int8 stays on XLA even where Pallas is available (fused in-register
    dequant loses at streaming sizes); fp32 packs.  Guards the 'auto'
    wiring."""
    from cleanumamba_tpu.ops.pallas import selective_scan as ss

    monkeypatch.setattr(ss, "pallas_available", lambda: True)
    s8 = Streamer(params, CFG, weights="int8", fused="auto")
    assert s8._pack_arrays is None
    s32 = Streamer(params, CFG, weights="fp32", fused="auto")
    assert s32._pack_arrays is not None


def test_pack_applicability_ragged():
    """A pruned-checkpoint-shaped model (odd channel widths) still packs."""
    cfg = CleanUMambaConfig(
        channels_H=24, max_H=56, encoder_n_layers=3,
        tsfm_n_head=4, tsfm_d_model=40, tsfm_d_inner=80,
        normalize_input=False)
    p = init_params(jax.random.PRNGKey(1), cfg)
    arrays, meta = pack_stream_params(p, cfg, jnp.float32)
    assert all(m is not None for m in meta["enc"] + meta["dec"])


@pytest.mark.parametrize("level", [0, 1, 2])
def test_encoder_level_fused_equals_xla(params, level):
    ep = params["encoder"][level]
    pk = pack_encoder_level(ep, CFG, level, jnp.float32)
    assert pk is not None
    arrays, meta = pk
    Cin = meta["Cin"]
    T = 5
    L = CFG.kernel_size + CFG.stride * (T - 1)
    x = _rand(jax.random.PRNGKey(level), 2, L, Cin)

    ref = encoder_level(ep, x, CFG, level)
    win = encoder_windows(x, CFG.kernel_size, CFG.stride)
    got = fused_encoder_level(win, arrays, meta, compute_dtype=jnp.float32,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("level_j", [0, 1, 2])
@pytest.mark.parametrize("has_prev", [False, True])
def test_decoder_level_fused_equals_xla(params, level_j, has_prev):
    D, S = CFG.encoder_n_layers, CFG.stride
    enc_i = D - 1 - level_j
    dp = params["decoder"][level_j]
    pk = pack_decoder_level(dp, CFG, enc_i, jnp.float32)
    assert pk is not None
    arrays, meta = pk
    C, Cout = meta["C"], meta["Cout"]
    T = 4
    key = jax.random.PRNGKey(7 * level_j + has_prev)
    ks = jax.random.split(key, 3)
    x = _rand(ks[0], 2, T, C)
    skip = _rand(ks[1], 2, T, C)
    prev = _rand(ks[2], 2, S, Cout) if has_prev else None
    relu = level_j != D - 1

    # XLA reference: exactly _decode_frame's per-level body
    y = decoder_level(dp, x + skip, CFG, enc_i, relu=False)
    tail_ref = y[:, -S:, :] - dp["convt_b"]
    y = y[:, :-S, :]
    if prev is not None:
        y = y.at[:, :S, :].add(prev)
    if relu:
        y = jax.nn.relu(y)

    prev_g = prev.reshape(2, 1, S * Cout) if prev is not None else None
    out_g, tail_g = fused_decoder_level(
        x, skip, prev_g, arrays, meta, relu=relu,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_g.reshape(2, T * S, Cout)),
                               np.asarray(y), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tail_g.reshape(2, S, Cout)),
                               np.asarray(tail_ref), atol=1e-5, rtol=1e-5)


def test_int8_pack_matches_dequantized_xla(params):
    """int8 packs dequantize in-kernel to the same values quant.py's XLA
    dequant produces upstream of the GEMM."""
    from cleanumamba_tpu.quant import dequantize_params, quantize_params

    qp = quantize_params(params, min_size=1024)
    level = 2
    ep_q = qp["encoder"][level]
    pk = pack_encoder_level(ep_q, CFG, level, jnp.bfloat16)
    assert pk is not None and "cw_scale" in pk[0]
    arrays, meta = pk
    T = 4
    L = CFG.kernel_size + CFG.stride * (T - 1)
    x = _rand(jax.random.PRNGKey(3), 1, L, meta["Cin"])

    ep_dq = dequantize_params(ep_q, jnp.float32)
    ref = encoder_level(ep_dq, x, CFG, level)
    win = encoder_windows(x, CFG.kernel_size, CFG.stride)
    got = fused_encoder_level(win, arrays, meta, compute_dtype=jnp.bfloat16,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


@pytest.mark.parametrize("normalize", [False, True])
def test_streamer_fused_equals_unfused(params, normalize):
    """Full stream: fused Streamer tracks the XLA Streamer frame-for-frame
    (fp32 packs -> tight tolerance), including across the prime boundary
    (prime is XLA; its state feeds fused steps)."""
    cfg = CFG if not normalize else CleanUMambaConfig(
        channels_H=128, max_H=256, encoder_n_layers=3,
        tsfm_n_head=4, tsfm_d_model=64, tsfm_d_inner=128,
        normalize_input=True)
    x = np.random.default_rng(0).normal(size=(1, 4000)).astype(np.float32) * 0.3

    ref = Streamer(params, cfg, fused=False)
    fus = Streamer(params, cfg, fused=True, fused_interpret=True)
    # feed stride-sized chunks so every post-prime step is the single-frame
    # (fused) path, not the block path
    ts, fl = cfg.total_stride, cfg.frame_length
    outs_r, outs_f = [], []
    outs_r.append(ref.feed(x[:, :fl]))
    outs_f.append(fus.feed(x[:, :fl]))
    for i in range(fl, 4000 - ts, ts):
        outs_r.append(ref.feed(x[:, i:i + ts]))
        outs_f.append(fus.feed(x[:, i:i + ts]))
    a = np.concatenate(outs_r, axis=1)
    b = np.concatenate(outs_f, axis=1)
    assert a.shape == b.shape and a.shape[1] > 10 * ts
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_streamer_fused_offline_equivalence(params):
    """And the fused stream still matches the offline forward (the
    reference's own invariant, CleanUMamba.py:568-591)."""
    cfg = CFG  # normalize_input=False matches offline exactly
    L = 4096
    x = np.random.default_rng(1).normal(size=(1, L)).astype(np.float32) * 0.3
    offline = np.asarray(forward(params, jnp.asarray(x), cfg))

    s = Streamer(params, cfg, fused=True, fused_interpret=True)
    ts = cfg.total_stride
    outs = [s.feed(x[:, i:i + ts]) for i in range(0, L, ts)]
    outs.append(s.flush())
    streamed = np.concatenate(outs, axis=1)
    assert streamed.shape[1] == L
    # Compare interior samples only: the last frame_length samples differ by
    # the flush boundary condition (offline zero-pads exactly to
    # valid_length; flush keeps streaming past it with more zero lookahead —
    # identical for the unfused streamer too, independent of the kernels).
    n = L - cfg.frame_length
    np.testing.assert_allclose(streamed[:, :n], offline[:, :n],
                               atol=1e-3, rtol=1e-3)
