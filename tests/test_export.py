"""Bidirectional checkpoint interop: export -> reload -> identical outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.convert import (
    convert_state_dict,
    export_reference_state_dict,
    save_reference_checkpoint,
)
from cleanumamba_tpu.models.cleanumamba import count_params, forward, init_params

MINI = dict(channels_H=16, max_H=32, encoder_n_layers=4, tsfm_n_layers=2,
            tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64)


@pytest.mark.parametrize("bottleneck", ["mamba", "lstm", "mamba2", "mha", "mamba_s4"])
def test_export_roundtrip(bottleneck, tmp_path):
    cfg = CleanUMambaConfig(bottleneck=bottleneck, **MINI)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if bottleneck == "mamba_s4":
        from cleanumamba_tpu.models.cleanumamba import prepare_for_length

        params = prepare_for_length(params, cfg, 2000)
    sd = export_reference_state_dict(params, cfg)
    params2 = convert_state_dict(sd, cfg)
    # identical structure first: zip() would silently truncate a lossy export
    assert jax.tree_util.tree_structure(params2) == jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # full save/load through the reference .pkl format
    path = str(tmp_path / "export.pkl")
    save_reference_checkpoint(path, params, cfg, n_iter=7)
    from cleanumamba_tpu.convert import load_reference_checkpoint

    cfg3, params3, meta = load_reference_checkpoint(path)
    assert meta["iter"] == 7
    assert cfg3.bottleneck == bottleneck
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2000)), jnp.float32)
    y1 = np.asarray(forward(params, x, cfg))
    y2 = np.asarray(forward(params3, x, cfg3))
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_export_pruned_model(tmp_path):
    """Prune, export, reload: ragged widths survive the reference format."""
    from cleanumamba_tpu.prune.pruner import apply_pruning

    cfg = CleanUMambaConfig(**MINI)
    params = init_params(jax.random.PRNGKey(1), cfg)
    params, _, _ = apply_pruning(
        params, {"d_inner0": list(range(8)), "skip_conn_1": [0, 1], "d_model": [3]}, cfg
    )
    path = str(tmp_path / "pruned.pkl")
    save_reference_checkpoint(path, params, cfg)
    from cleanumamba_tpu.convert import load_reference_checkpoint

    cfg2, params2, _ = load_reference_checkpoint(path)
    assert count_params(params2) == count_params(params)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2000)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(forward(params, x, cfg)),
        np.asarray(forward(params2, x, cfg2)),
        atol=1e-6,
    )
