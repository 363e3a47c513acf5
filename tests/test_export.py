"""jax.export serving bundles: roundtrip exactness and state handoff.

The exported artifact must reproduce the live functions bit-for-bit (same
StableHLO, same backend) and the exported streaming step must continue a
session primed by the exported prime — the serving loop owns the state
pytree (see cleanumamba_tpu/export.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu import export as ex
from cleanumamba_tpu.streaming import stream_prime, stream_step

TINY = dict(channels_H=8, max_H=16, tsfm_n_head=2, tsfm_d_model=16,
            tsfm_d_inner=32, normalize_input=True)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = CleanUMambaConfig(bottleneck="mamba", **TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    L = cfg.valid_length(4000)
    path = str(tmp_path_factory.mktemp("bundle"))
    prime_exp, step_exp = ex.export_stream(params, cfg)
    ex.save_bundle(
        path, cfg,
        {"offline": ex.export_offline(params, cfg, L),
         "prime": prime_exp, "step": step_exp},
        extra_meta={"length": L},
    )
    return cfg, params, L, path


def test_offline_roundtrip_exact(bundle):
    # exactness is jit-vs-jit: the exported artifact re-executes the same
    # StableHLO the jitted live function lowers to (eager execution fuses
    # differently and is NOT the comparison baseline)
    cfg, params, L, path = bundle
    cfg2, fns = ex.load_bundle(path)
    assert cfg2 == cfg
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, L)).astype(np.float32) * 0.3)
    y_direct = jax.jit(lambda p, a: forward(p, a, cfg))(params, x)
    y_loaded = fns["offline"](params, x)
    assert y_loaded.shape == y_direct.shape
    np.testing.assert_array_equal(np.asarray(y_direct), np.asarray(y_loaded))


def test_stream_state_handoff_exact(bundle):
    cfg, params, L, path = bundle
    _, fns = ex.load_bundle(path)
    jit_prime = jax.jit(lambda p, f: stream_prime(p, cfg, f))
    jit_step = jax.jit(lambda p, s, n: stream_step(p, cfg, s, n))
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, L)).astype(np.float32) * 0.3)
    state_d, out_d = jit_prime(params, x[:, : cfg.frame_length])
    state_l, out_l = fns["prime"](params, x[:, : cfg.frame_length])
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_l))
    # two steady-state steps through the loaded artifact vs the live step
    pos = cfg.frame_length
    for _ in range(2):
        new = x[:, pos : pos + cfg.total_stride]
        state_d, od = jit_step(params, state_d, new)
        state_l, ol = fns["step"](params, state_l, new)
        np.testing.assert_array_equal(np.asarray(od), np.asarray(ol))
        pos += cfg.total_stride


def test_bundle_is_self_describing(bundle):
    cfg, _, L, path = bundle
    import json, os
    meta = json.load(open(os.path.join(path, "bundle.json")))
    assert meta["length"] == L
    # batch/block are schema fields derived from traced shapes, not
    # caller-supplied metadata (serve.from_bundle depends on them)
    assert meta["batch"] == 1 and meta["block"] == 1
    assert set(meta["functions"]) == {"offline", "prime", "step"}
    for entry in meta["functions"].values():
        assert entry["platforms"], entry
        assert os.path.exists(os.path.join(path, entry["file"]))


@pytest.mark.slow
def test_block_step_export_matches_singles():
    cfg = CleanUMambaConfig(bottleneck="mamba", **TINY)
    params = init_params(jax.random.PRNGKey(2), cfg)
    prime_exp, step4 = ex.export_stream(params, cfg, block=4)
    L = cfg.frame_length + 8 * cfg.total_stride
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, L)).astype(np.float32) * 0.3)
    state, _ = prime_exp.call(params, x[:, : cfg.frame_length])
    state_b = state
    outs_single, outs_block = [], []
    pos = cfg.frame_length
    for _ in range(2):
        blk = x[:, pos : pos + 4 * cfg.total_stride]
        for j in range(4):
            state, o = stream_step(
                params, cfg, state, blk[:, j * cfg.total_stride : (j + 1) * cfg.total_stride])
            outs_single.append(np.asarray(o))
        state_b, ob = step4.call(params, state_b, blk)
        outs_block.append(np.asarray(ob))
        pos += 4 * cfg.total_stride
    single = np.concatenate(outs_single, axis=1)
    block = np.concatenate(outs_block, axis=1)
    np.testing.assert_allclose(single, block, atol=2e-6)
