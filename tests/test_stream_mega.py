"""Whole-frame mega-kernel ≡ the XLA streaming step.

ops/pallas/stream_mega.py lowers the entire stream_step (encoder stack,
mamba bottleneck, decoder stack, cache updates) into one pallas_call; the
math must match streaming.stream_step exactly (reference semantics
CleanUMamba.py:420-484).  CPU tests run in interpret mode; the on-chip
drive covers the compiled path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.ops.pallas.stream_mega import pack_mega
from cleanumamba_tpu.streaming import (
    Streamer,
    stream_prime,
    stream_step,
    stream_step_mega,
)

# mega-compatible tiny geometry: every matrix ≤128 lanes
CFG = CleanUMambaConfig(
    channels_H=16, max_H=48, encoder_n_layers=4,
    tsfm_n_layers=2, tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64,
    normalize_input=False,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_pack_gates(params):
    assert pack_mega(params, CFG, jnp.float32) is not None
    # big-lane config (E8-full family) must refuse
    big_cfg = CleanUMambaConfig(
        channels_H=64, max_H=768, encoder_n_layers=2,
        tsfm_n_head=8, tsfm_d_model=512, tsfm_d_inner=2048)
    pbig = init_params(jax.random.PRNGKey(1), big_cfg)
    assert pack_mega(pbig, big_cfg, jnp.bfloat16) is None


@pytest.mark.slow
@pytest.mark.parametrize("normalize", [False, True])
def test_mega_step_equals_xla(params, normalize):
    cfg = CFG if not normalize else CleanUMambaConfig(
        channels_H=16, max_H=48, encoder_n_layers=4,
        tsfm_n_layers=2, tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64,
        normalize_input=True)
    mega = pack_mega(params, cfg, jnp.float32)
    assert mega is not None
    rng = np.random.default_rng(0)
    fl, ts = cfg.frame_length, cfg.total_stride
    x = (rng.normal(size=(2, fl + 6 * ts)) * 0.3).astype(np.float32)

    st_ref, o0 = stream_prime(params, cfg, jnp.asarray(x[:, :fl]))
    st_mega = st_ref
    for t in range(6):
        new = jnp.asarray(x[:, fl + t * ts: fl + (t + 1) * ts])
        st_ref, y_ref = stream_step(params, cfg, st_ref, new)
        st_mega, y_mega = stream_step_mega(cfg, st_mega, new, mega,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(y_mega), np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-4), t
    # states track too (so the paths can interleave)
    for a, b in zip(jax.tree_util.tree_leaves(st_ref),
                    jax.tree_util.tree_leaves(st_mega)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_mega_bf16_tracks_fp32(params):
    """bf16 packs track the fp32 step within bf16 tolerance (the latency
    configuration on chip)."""
    mega = pack_mega(params, CFG, jnp.bfloat16)
    assert mega is not None
    rng = np.random.default_rng(2)
    fl, ts = CFG.frame_length, CFG.total_stride
    x = (rng.normal(size=(1, fl + 3 * ts)) * 0.3).astype(np.float32)
    st_r, _ = stream_prime(params, CFG, jnp.asarray(x[:, :fl]))
    st_m = st_r
    for t in range(3):
        new = jnp.asarray(x[:, fl + t * ts: fl + (t + 1) * ts])
        st_r, yr = stream_step(params, CFG, st_r, new)
        st_m, ym = stream_step_mega(CFG, st_m, new, mega, interpret=True)
    scale = float(jnp.abs(yr).max()) + 1e-9
    assert float(jnp.abs(ym - yr).max()) / scale < 0.05


@pytest.mark.slow
def test_streamer_mega_offline_equivalence(params):
    """fused='mega' Streamer matches the offline forward (the reference's
    own streaming invariant, CleanUMamba.py:568-591)."""
    L = 2048
    x = np.random.default_rng(1).normal(size=(1, L)).astype(np.float32) * 0.3
    offline = np.asarray(forward(params, jnp.asarray(x), CFG))

    s = Streamer(params, CFG, fused="mega", fused_interpret=True)
    ts = CFG.total_stride
    outs = [s.feed(x[:, i:i + ts]) for i in range(0, L, ts)]
    outs.append(s.flush())
    streamed = np.concatenate(outs, axis=1)
    assert streamed.shape[1] == L
    n = L - CFG.frame_length  # flush boundary differs (see test_stream_fused)
    np.testing.assert_allclose(streamed[:, :n], offline[:, :n],
                               atol=1e-3, rtol=1e-3)


def test_streamer_auto_prefers_mega(params, monkeypatch):
    """fused='auto' on TPU resolves to the mega kernel when the model packs
    (fastest + most accurate measured path), per-level fusion otherwise, and
    stays on XLA for int8 / no-Pallas backends.  Policy only — nothing is
    executed (jit is lazy), so the probe runs fine on CPU."""
    monkeypatch.setattr(
        "cleanumamba_tpu.ops.pallas.selective_scan.pallas_available",
        lambda: True)
    assert Streamer(params, CFG).fused_mode == "mega"
    assert Streamer(params, CFG, weights="int8").fused_mode == "xla"
    big_cfg = CleanUMambaConfig(
        channels_H=64, max_H=768, encoder_n_layers=2,
        tsfm_n_head=8, tsfm_d_model=512, tsfm_d_inner=2048)
    pbig = init_params(jax.random.PRNGKey(1), big_cfg)
    assert Streamer(pbig, big_cfg).fused_mode == "fused"
    monkeypatch.setattr(
        "cleanumamba_tpu.ops.pallas.selective_scan.pallas_available",
        lambda: False)
    assert Streamer(params, CFG).fused_mode == "xla"


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["mamba2", "lstm", "mamba_s4", "mha"])
def test_mega_step_equals_xla_mamba2(params, kind):
    cfg = CleanUMambaConfig(
        channels_H=16, max_H=48, encoder_n_layers=4,
        tsfm_n_layers=2, tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64,
        normalize_input=True, bottleneck=kind)
    p2 = init_params(jax.random.PRNGKey(3), cfg)
    mega = pack_mega(p2, cfg, jnp.float32)
    assert mega is not None
    rng = np.random.default_rng(4)
    fl, ts = cfg.frame_length, cfg.total_stride
    x = (rng.normal(size=(1, fl + 4 * ts)) * 0.3).astype(np.float32)
    st_r, _ = stream_prime(p2, cfg, jnp.asarray(x[:, :fl]))
    st_m = st_r
    for t in range(4):
        new = jnp.asarray(x[:, fl + t * ts: fl + (t + 1) * ts])
        st_r, yr = stream_step(p2, cfg, st_r, new)
        st_m, ym = stream_step_mega(cfg, st_m, new, mega, interpret=True)
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yr),
                                   atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(st_r),
                    jax.tree_util.tree_leaves(st_m)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
