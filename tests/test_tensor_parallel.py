"""Tensor parallelism == single-device forward (parallel/tensor.py).

The TP forward shards weights over a model axis and must reproduce the
plain forward bit-for-tolerance (fp32, psum reassociation only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.parallel.tensor import tp_forward, tp_prepare

TINY = dict(
    channels_H=8,
    max_H=16,
    encoder_n_layers=4,
    tsfm_n_layers=2,
    tsfm_n_head=2,
    tsfm_d_model=16,
    tsfm_d_inner=32,
    normalize_input=False,
)


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


@pytest.mark.parametrize("n", [2, 4])
@pytest.mark.parametrize("bypass,normalize", [(0, False), (4, True)])
def test_tp_forward_matches(n, bypass, normalize):
    cfg = CleanUMambaConfig(**{**TINY, "bypass_channels": bypass,
                               "normalize_input": normalize})
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 801)), jnp.float32)
    ref = forward(params, x, cfg, scan_impl="xla")
    mesh = _mesh((n,), ("model",))
    got = tp_forward(params, x, cfg, mesh, scan_impl="xla")
    assert got.shape == ref.shape
    assert _rel(got, ref) < 2e-5


def test_tp_param_memory_shards():
    """The big leaves really are sharded: local slice = 1/n of the global."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params_tp, specs = tp_prepare(params, cfg, 4)
    mx = specs["bottleneck"]["layers"][0]["mixer"]
    assert mx["in_proj"] == jax.sharding.PartitionSpec(None, "model")
    assert mx["out_proj"] == jax.sharding.PartitionSpec("model", None)
    # every sharded dim divisible by 4
    def chk(p, s):
        for ax, name in enumerate(s):
            if name is not None:
                assert p.shape[ax] % 4 == 0
    jax.tree_util.tree_map(chk, params_tp, specs,
                           is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))


def test_tp_dp_compose():
    """2-D mesh: batch over 'data' x weights over 'model'."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 801)), jnp.float32)
    ref = forward(params, x, cfg, scan_impl="xla")
    mesh = _mesh((2, 4), ("data", "model"))
    got = tp_forward(params, x, cfg, mesh, data_axis="data", scan_impl="xla")
    assert _rel(got, ref) < 2e-5


def test_tp_rejects_indivisible():
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="not divisible"):
        tp_prepare(params, cfg, 3)


def test_tp_rejects_non_mamba():
    cfg = CleanUMambaConfig(**{**TINY, "bottleneck": "lstm"})
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError):
        tp_prepare(params, cfg, 2)
