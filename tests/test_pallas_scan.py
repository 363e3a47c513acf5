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


@pytest.mark.parametrize("L,di,chunk,tile_d", [(37, 24, 16, 16), (64, 16, 32, 8)])
def test_pallas_bwd_matches_xla_reverse(rng, L, di, chunk, tile_d):
    """pallas_selective_scan_bwd == ops.scan._ssg_bwd on every gradient,
    including ragged L/d_inner padding and the gh_last seed."""
    from cleanumamba_tpu.ops.pallas.selective_scan import pallas_selective_scan_bwd
    from cleanumamba_tpu.ops.scan import _ssg_bwd

    u, dt, A, B, C, D, h0 = _inputs(rng, L=L, di=di)
    interp = not pallas_available()
    y, h_last, h_starts = pallas_selective_scan(
        *(u, dt, A, B, C, D, h0), chunk=chunk, tile_d=tile_d,
        interpret=interp, return_boundaries=True)
    gy = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
    ghl = jnp.asarray(rng.normal(size=h_last.shape), jnp.float32)
    gu, gdt, gA, gB, gC, gD, gh0 = pallas_selective_scan_bwd(
        u, dt, A, B, C, D, h_starts, gy, ghl, chunk=chunk, tile_d=tile_d,
        interpret=interp)
    res = (u, dt, A, B, C, D, h0, jnp.moveaxis(h_starts, 1, 0))
    ref = _ssg_bwd(chunk, res, (gy, ghl))
    names = ("gu", "gdt", "gA", "gB", "gC", "gD", "gh0")
    for got, want, name in zip((gu, gdt, gA, gB, gC, gD, gh0), ref, names):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4,
            err_msg=name)


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
