"""Pallas selective-scan kernel vs the XLA reference (interpret mode on CPU;
the same test runs compiled when a TPU backend is present)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.ops.scan import selective_scan
from cleanumamba_tpu.ops.pallas.selective_scan import (
    pallas_available,
    pallas_selective_scan,
    selective_scan_auto,
)


def _inputs(rng, Bsz=2, L=37, di=24, ds=8):
    u = jnp.asarray(rng.normal(size=(Bsz, L, di)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.normal(size=(Bsz, L, di))) * 0.1, jnp.float32)
    A = jnp.asarray(-np.abs(rng.normal(size=(di, ds))), jnp.float32)
    B = jnp.asarray(rng.normal(size=(Bsz, L, ds)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(Bsz, L, ds)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(di,)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(Bsz, di, ds)), jnp.float32)
    return u, dt, A, B, C, D, h0


@pytest.mark.parametrize("L,chunk,tile_d", [(37, 16, 16), (64, 32, 8), (16, 32, 32)])
def test_pallas_scan_matches_xla(rng, L, chunk, tile_d):
    args = _inputs(rng, L=L)
    interp = not pallas_available()
    y_p, h_p = pallas_selective_scan(*args, chunk=chunk, tile_d=tile_d, interpret=interp)
    y_r, h_r = selective_scan(*args, chunk=8)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_r), atol=1e-4, rtol=1e-4)


def test_custom_vjp_grad_matches_xla(rng):
    if not pallas_available():
        pytest.skip("vjp wrapper forward needs compiled pallas (TPU)")
    args = _inputs(rng)

    def f_pal(u, dt, A, B, C, D, h0):
        y, h = selective_scan_auto(u, dt, A, B, C, D, h0, 16)
        return jnp.sum(y**2) + jnp.sum(h**2)

    def f_ref(u, dt, A, B, C, D, h0):
        y, h = selective_scan(u, dt, A, B, C, D, h0, chunk=16)
        return jnp.sum(y**2) + jnp.sum(h**2)

    g_p = jax.grad(f_pal, argnums=(0, 2))(*args)
    g_r = jax.grad(f_ref, argnums=(0, 2))(*args)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)
