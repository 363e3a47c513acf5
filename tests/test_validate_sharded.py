"""Batch-sharded evaluation over the virtual 8-device mesh == serial eval."""

import numpy as np

import jax

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.data import SyntheticDenoiseDataset
from cleanumamba_tpu.eval.validate import validate
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.parallel.mesh import make_mesh

TINY = dict(
    channels_H=8, max_H=16, encoder_n_layers=4, tsfm_n_layers=2,
    tsfm_n_head=2, tsfm_d_model=16, tsfm_d_inner=32,
)


def test_sharded_eval_matches_serial():
    assert jax.device_count() >= 8
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ds = SyntheticDenoiseDataset(n_items=10, crop_length_sec=1.0, seed=5)
    serial = validate(params, cfg, ds, pad_to=16000)
    mesh = make_mesh(8)
    sharded = validate(params, cfg, ds, pad_to=16000, mesh=mesh)
    assert set(serial) == set(sharded)
    for k in serial:
        np.testing.assert_allclose(sharded[k], serial[k], rtol=1e-3, atol=1e-4)
