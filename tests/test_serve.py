"""SessionMultiplexer: batched concurrent sessions are mutually exact.

The serving claim (serve.py): a session multiplexed alongside arbitrary
other traffic — staggered joins, slot churn, empty slots — produces the
same audio as the same session streamed alone.  The solo oracle is the
plain jitted stream_prime/stream_step loop at batch=1; batch-width changes
XLA fusion order, so equality is tight-tolerance, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.serve import SessionMultiplexer
from cleanumamba_tpu.streaming import stream_prime, stream_step

TINY = dict(channels_H=8, max_H=16, tsfm_n_head=2, tsfm_d_model=16,
            tsfm_d_inner=32, normalize_input=True)


@pytest.fixture(scope="module")
def model():
    cfg = CleanUMambaConfig(bottleneck="mamba", **TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _solo(params, cfg, audio):
    """Oracle: the session streamed alone at batch=1, whole ticks only."""
    fl, ts = cfg.frame_length, cfg.total_stride
    prime = jax.jit(lambda p, f: stream_prime(p, cfg, f))
    step = jax.jit(lambda p, s, n: stream_step(p, cfg, s, n))
    state, out = prime(params, jnp.asarray(audio[None, :fl]))
    outs = [np.asarray(out[0])]
    pos = fl
    while pos + ts <= audio.shape[0]:
        state, out = step(params, state, jnp.asarray(audio[None, pos:pos + ts]))
        outs.append(np.asarray(out[0]))
        pos += ts
    return np.concatenate(outs)


def _audio(seed, n):
    return (np.random.default_rng(seed).normal(size=n) * 0.2).astype(np.float32)


@pytest.mark.slow
def test_staggered_sessions_match_solo(model):
    """Three sessions joining at different ticks, fed in uneven chunks,
    each match their solo stream; a fourth slot stays empty throughout."""
    cfg, params = model
    fl, ts = cfg.frame_length, cfg.total_stride
    mux = SessionMultiplexer(params, cfg, slots=4)
    lengths = [fl + 23 * ts, fl + 17 * ts, fl + 11 * ts]
    audios = [_audio(i, n) for i, n in enumerate(lengths)]
    got = {i: [] for i in range(3)}
    sids = {}

    # session 0 joins immediately; 1 and 2 join after 0 has advanced
    sids[0] = mux.open()
    got[0].append(mux.feed(sids[0], audios[0][: fl + 5 * ts]))
    sids[1] = mux.open()
    got[1].append(mux.feed(sids[1], audios[1][: fl + ts]))
    sids[2] = mux.open()
    # uneven round-robin feeding of the remainder
    pos = [fl + 5 * ts, fl + ts, 0]
    chunk = [3 * ts, 2 * ts, 5 * ts]
    while any(pos[i] < lengths[i] for i in range(3)):
        for i in range(3):
            if pos[i] < lengths[i]:
                nxt = min(pos[i] + chunk[i], lengths[i])
                got[i].append(mux.feed(sids[i], audios[i][pos[i]:nxt]))
                pos[i] = nxt

    for i in range(3):
        ours = np.concatenate(got[i] + [mux._drain(sids[i])])
        ref = _solo(params, cfg, audios[i])
        assert ours.shape == ref.shape, (i, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_slot_churn_reuses_slots_exactly(model):
    """Close a session mid-run, re-admit a NEW session into the same slot
    while another keeps streaming: both the survivor and the newcomer match
    their solo streams (the splice fully overwrites the dead state)."""
    cfg, params = model
    fl, ts = cfg.frame_length, cfg.total_stride
    mux = SessionMultiplexer(params, cfg, slots=2)
    a_live = _audio(10, fl + 20 * ts)
    a_dead = _audio(11, fl + 4 * ts)
    a_new = _audio(12, fl + 8 * ts)

    live = mux.open()
    dead = mux.open()
    out_live = [mux.feed(live, a_live[: fl + 2 * ts])]
    mux.feed(dead, a_dead[: fl + 2 * ts])
    mux.close(dead)

    newcomer = mux.open()
    assert newcomer == dead  # same slot, reused
    out_new = [mux.feed(newcomer, a_new[: fl + ts])]
    pos_l, pos_n = fl + 2 * ts, fl + ts
    while pos_l < a_live.shape[0] or pos_n < a_new.shape[0]:
        if pos_l < a_live.shape[0]:
            nxt = min(pos_l + 2 * ts, a_live.shape[0])
            out_live.append(mux.feed(live, a_live[pos_l:nxt]))
            pos_l = nxt
        if pos_n < a_new.shape[0]:
            nxt = min(pos_n + 2 * ts, a_new.shape[0])
            out_new.append(mux.feed(newcomer, a_new[pos_n:nxt]))
            pos_n = nxt
    # collect ticks that fired during the other session's feeds
    out_live.append(mux._drain(live))
    out_new.append(mux._drain(newcomer))

    np.testing.assert_allclose(np.concatenate(out_live),
                               _solo(params, cfg, a_live),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.concatenate(out_new),
                               _solo(params, cfg, a_new),
                               atol=1e-5, rtol=1e-5)


def test_block_ticks_match_solo(model):
    """block=4 multiplexing (stream_step_block under the hood) matches the
    per-frame solo stream on the tick-aligned prefix."""
    cfg, params = model
    fl, ts = cfg.frame_length, cfg.total_stride
    mux = SessionMultiplexer(params, cfg, slots=2, block=4)
    audio = _audio(20, fl + 16 * ts)
    sid = mux.open()
    outs = [mux.feed(sid, audio)]
    outs.append(mux._drain(sid))
    ours = np.concatenate(outs)
    ref = _solo(params, cfg, audio)[: ours.shape[0]]
    assert ours.shape[0] == ts + 16 * ts  # prime + 4 block-4 ticks
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_flush_trims_to_fed_length(model):
    cfg, params = model
    fl, ts = cfg.frame_length, cfg.total_stride
    mux = SessionMultiplexer(params, cfg, slots=2)
    n = fl + 3 * ts + 7  # ragged tail
    sid = mux.open()
    out = [mux.feed(sid, _audio(30, n))]
    out.append(mux.flush(sid))
    total = sum(o.shape[0] for o in out)
    assert total == n
    mux.close(sid)
    assert not mux._open[sid]


def test_open_overflow_raises(model):
    cfg, params = model
    mux = SessionMultiplexer(params, cfg, slots=2)
    mux.open(), mux.open()
    with pytest.raises(RuntimeError):
        mux.open()


def test_from_bundle_serves_without_model_code(model, tmp_path):
    """An exported bundle drives the multiplexer; outputs match the live
    multiplexer bitwise (same StableHLO, same backend, same batch)."""
    cfg, params = model
    from cleanumamba_tpu import export as ex

    fl, ts = cfg.frame_length, cfg.total_stride
    # library-API save, no extra_meta: batch/block must come from the
    # bundle schema itself (save_bundle derives them from traced shapes)
    prime_exp, step_exp = ex.export_stream(params, cfg, batch=2, block=1)
    ex.save_bundle(str(tmp_path), cfg,
                   {"prime": prime_exp, "step": step_exp})
    mux_b = SessionMultiplexer.from_bundle(str(tmp_path), params)
    assert mux_b.slots == 2 and mux_b.block == 1
    mux_l = SessionMultiplexer(params, cfg, slots=2)

    audio = _audio(40, fl + 6 * ts)
    for mux in (mux_b, mux_l):
        sid = mux.open()
        mux.outputs = np.concatenate(
            [mux.feed(sid, audio), mux._drain(sid)])
    np.testing.assert_array_equal(mux_b.outputs, mux_l.outputs)
