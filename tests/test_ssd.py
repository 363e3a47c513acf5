"""Mamba2 SSD masked-matmul scan vs the elementwise selective scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.ops.scan import selective_scan, ssd_scan


@pytest.mark.parametrize("L,chunk", [(40, 16), (64, 64), (100, 32)])
def test_ssd_matches_selective_scan(rng, L, chunk):
    Bsz, H, P, N = 2, 3, 4, 5
    d_inner = H * P
    x = rng.normal(size=(Bsz, L, H, P)).astype(np.float32)
    dt = (np.abs(rng.normal(size=(Bsz, L, H))) * 0.2).astype(np.float32)
    A_head = -np.abs(rng.normal(size=(H,))).astype(np.float32)
    B = rng.normal(size=(Bsz, L, N)).astype(np.float32)
    C = rng.normal(size=(Bsz, L, N)).astype(np.float32)
    D_head = rng.normal(size=(H,)).astype(np.float32)
    h0 = rng.normal(size=(Bsz, H, P, N)).astype(np.float32)

    y_ssd, h_ssd = ssd_scan(*map(jnp.asarray, (x, dt, A_head, B, C, D_head, h0)), chunk=chunk)

    # reference: broadcast heads to the elementwise scan
    u = jnp.asarray(x.reshape(Bsz, L, d_inner))
    dt_full = jnp.asarray(np.repeat(dt, P, axis=-1))
    A_full = jnp.asarray(np.repeat(A_head, P)[:, None] * np.ones((1, N), np.float32))
    D_full = jnp.asarray(np.repeat(D_head, P))
    h0_full = jnp.asarray(h0.reshape(Bsz, d_inner, N))
    y_ref, h_ref = selective_scan(u, dt_full, A_full, jnp.asarray(B), jnp.asarray(C),
                                  D_full, h0_full, chunk=8)

    np.testing.assert_allclose(
        np.asarray(y_ssd).reshape(Bsz, L, d_inner), np.asarray(y_ref),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(h_ssd).reshape(Bsz, d_inner, N), np.asarray(h_ref),
        atol=2e-4, rtol=1e-3,
    )


def test_mamba2_mixer_ssd_equals_broadcast(rng):
    from cleanumamba_tpu.config import CleanUMambaConfig
    from cleanumamba_tpu.models.bottleneck_mamba2 import mixer_forward, mixer_init

    cfg = CleanUMambaConfig(
        channels_H=16, max_H=32, encoder_n_layers=4, tsfm_n_layers=2,
        tsfm_n_head=2, tsfm_d_model=32, tsfm_d_inner=64, bottleneck="mamba2",
    )
    p = mixer_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 50, 32)) * 0.5, jnp.float32)
    y1 = np.asarray(mixer_forward(p, x, use_ssd=True))
    y2 = np.asarray(mixer_forward(p, x, use_ssd=False))
    np.testing.assert_allclose(y1, y2, atol=2e-4, rtol=1e-3)


def test_ssd_custom_vjp_matches_ad(rng):
    """ssd_scan_grad's hand-derived backward (transposed masked matmul,
    chunk-boundary recompute) vs AD through the chunked ssd_scan forward —
    every gradient, with and without h0, across a chunk boundary."""
    from cleanumamba_tpu.ops.scan import ssd_scan_grad

    Bsz, L, H, P, N = 2, 37, 3, 4, 5  # L=37 exercises the padded tail
    x = jnp.asarray(rng.normal(size=(Bsz, L, H, P)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.normal(size=(Bsz, L, H))) * 0.1 + 0.01, jnp.float32)
    A = jnp.asarray(-np.abs(rng.normal(size=(H,))) - 0.2, jnp.float32)
    B = jnp.asarray(rng.normal(size=(Bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(Bsz, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(Bsz, H, P, N)), jnp.float32)
    gy = jnp.asarray(rng.normal(size=(Bsz, L, H, P)), jnp.float32)
    gh = jnp.asarray(rng.normal(size=(Bsz, H, P, N)), jnp.float32)

    def loss_ad(*args):
        y, hl = ssd_scan(*args, chunk=8)
        return jnp.sum(y * gy) + jnp.sum(hl * gh)

    def loss_vjp(*args):
        y, hl = ssd_scan_grad(*args, 8)
        return jnp.sum(y * gy) + jnp.sum(hl * gh)

    g_ad = jax.grad(loss_ad, argnums=(0, 1, 2, 3, 4, 5, 6))(x, dt, A, B, C, D, h0)
    g_vjp = jax.grad(loss_vjp, argnums=(0, 1, 2, 3, 4, 5, 6))(x, dt, A, B, C, D, h0)
    for name, a, b in zip("x dt A B C D h0".split(), g_ad, g_vjp):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * scale, rtol=1e-4,
                                   err_msg=f"grad {name}")

    def l2_ad(*args):
        return jnp.sum(ssd_scan(*args, None, chunk=8)[0] * gy)

    def l2_vjp(*args):
        return jnp.sum(ssd_scan_grad(*args, None, 8)[0] * gy)

    ga = jax.grad(l2_ad, argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C, D)
    gb = jax.grad(l2_vjp, argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C, D)
    for name, a, b in zip("x dt A B C".split(), ga, gb):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * scale, rtol=1e-4,
                                   err_msg=f"h0=None grad {name}")


def test_ssd_grad_finite(rng):
    Bsz, L, H, P, N = 1, 32, 2, 4, 4
    x = jnp.asarray(rng.normal(size=(Bsz, L, H, P)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.normal(size=(Bsz, L, H))) * 0.1, jnp.float32)
    A = jnp.asarray(-np.abs(rng.normal(size=(H,))), jnp.float32)
    B = jnp.asarray(rng.normal(size=(Bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(Bsz, L, N)), jnp.float32)

    def loss(A):
        y, h = ssd_scan(x, dt, A, B, C, chunk=16)
        return jnp.sum(y**2) + jnp.sum(h**2)

    g = jax.grad(loss)(A)
    assert np.isfinite(np.asarray(g)).all()
