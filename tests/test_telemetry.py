"""Telemetry-tap forward + act_var importance metric tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import (
    forward,
    forward_with_telemetry,
    init_params,
)
from cleanumamba_tpu.prune.groups import build_groups
from cleanumamba_tpu.prune.importance import get_prune_channels, group_importances
from cleanumamba_tpu.prune.telemetry import TelemetryAccumulator

TINY = dict(
    channels_H=16, max_H=32, encoder_n_layers=4, tsfm_n_layers=2,
    tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64,
)


@pytest.mark.slow
def test_telemetry_forward_matches_plain():
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2048)), jnp.float32)
    y0 = np.asarray(forward(params, x, cfg, scan_impl="xla"))
    y1, taps = forward_with_telemetry(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y1), y0, atol=1e-5)
    # every expected tap present with the right width
    D = cfg.encoder_n_layers
    for i in range(D):
        assert f"enc_conv_{i}" in taps and f"enc_out_{i}" in taps
        assert f"dec_mix_{i}" in taps
    assert "d_model_in" in taps
    for l in range(cfg.tsfm_n_layers):
        assert taps[f"d_inner_xz_{l}"].shape == (2 * cfg.d_inner,)


def test_act_var_importance():
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    acc = TelemetryAccumulator()
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=(2, 2048)), jnp.float32)
        _, taps = forward_with_telemetry(params, x, cfg)
        acc.update({k: np.asarray(v) for k, v in taps.items()}, n_samples=2)
    groups = {g.name: g for g in build_groups(params, cfg)}
    g = groups["encode_down_1"]
    imps = group_importances(params, g, telemetry=acc.as_dict())
    assert imps["act_var"] is not None
    assert imps["act_var"].shape == (g.n_channels,)
    assert np.all(imps["act_var"] >= 0)
    # selection with the act_var metric works without grads
    sel, _, _ = get_prune_channels(
        [g], params, None, "act_var", n_prune_channels=2, min_channels_per_group=4,
        telemetry=acc.as_dict(),
    )
    assert sum(len(v) for v in sel.values()) >= 1
