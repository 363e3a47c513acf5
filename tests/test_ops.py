"""Kernel-level op tests: our MXU-oriented matmul formulations vs torch's
cuDNN-semantics convolutions (torch CPU used only as a test oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.ops.conv import (
    causal_depthwise_conv,
    conv1d,
    conv1d_strided_matmul,
    conv_transpose1d,
    glu_activation,
)
from cleanumamba_tpu.ops.norms import layer_norm, rms_norm
from cleanumamba_tpu.ops.scan import (
    selective_scan,
    selective_scan_ref,
    selective_scan_step,
)

torch = pytest.importorskip("torch")


def test_conv1d_matches_torch(rng):
    B, L, Cin, Cout, K, S = 2, 37, 5, 7, 4, 2
    x = rng.normal(size=(B, L, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cin, Cout)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)
    y = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=S)
    m = torch.nn.Conv1d(Cin, Cout, K, S)
    m.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
    m.bias.data = torch.from_numpy(b)
    yt = m(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_conv1d_grouped_matches_torch(rng):
    B, L, Cin, Cout, K, S, G = 2, 20, 8, 12, 4, 2, 4
    x = rng.normal(size=(B, L, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cin // G, Cout)).astype(np.float32)
    y = conv1d(jnp.asarray(x), jnp.asarray(w), None, stride=S, groups=G)
    m = torch.nn.Conv1d(Cin, Cout, K, S, groups=G, bias=False)
    m.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
    yt = m(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_conv1d_strided_matmul_equals_conv(rng):
    B, L, Cin, Cout = 2, 40, 3, 6
    x = rng.normal(size=(B, L, Cin)).astype(np.float32)
    w = rng.normal(size=(4, Cin, Cout)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)
    y1 = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2)
    y2 = conv1d_strided_matmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.mark.parametrize("T", [1, 2, 9])
def test_conv_transpose1d_matches_torch(rng, T):
    B, Cin, Cout, K, S = 2, 5, 3, 4, 2
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cin, Cout)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)
    y = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=S)
    m = torch.nn.ConvTranspose1d(Cin, Cout, K, S)
    m.weight.data = torch.from_numpy(w.transpose(1, 2, 0).copy())  # (Cin,Cout,K)
    m.bias.data = torch.from_numpy(b)
    yt = m(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    assert y.shape == yt.shape == (B, (T - 1) * S + K, Cout)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_causal_depthwise_conv_matches_torch(rng):
    B, L, C, K = 2, 19, 6, 4
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    w = rng.normal(size=(K, C)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    y = causal_depthwise_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    m = torch.nn.Conv1d(C, C, K, groups=C, padding=K - 1)
    m.weight.data = torch.from_numpy(w.T[:, None, :].copy())
    m.bias.data = torch.from_numpy(b)
    yt = m(torch.from_numpy(x.transpose(0, 2, 1)))[..., :L].detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt.transpose(0, 2, 1), atol=1e-5)


def test_glu_activation(rng):
    # reference layers.py:26-41 semantics incl. bypass channels
    x = rng.normal(size=(2, 7, 10)).astype(np.float32)
    y = glu_activation(jnp.asarray(x), "Sigmoid", 0)
    expect = x[..., :5] * (1 / (1 + np.exp(-x[..., 5:])))
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-6)
    y2 = glu_activation(jnp.asarray(x), "ReLU", 2)
    expect2 = np.concatenate(
        [x[..., :2], x[..., 2:6] * np.maximum(x[..., 6:], 0)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(y2), expect2, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    s = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    y = layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 1e-5)
    m = torch.nn.LayerNorm(16)
    m.weight.data = torch.from_numpy(s)
    m.bias.data = torch.from_numpy(b)
    yt = m(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


@pytest.mark.parametrize("L,chunk", [(7, 4), (64, 16), (100, 32), (31, 32)])
def test_selective_scan_matches_ref(rng, L, chunk):
    B, d_inner, d_state = 2, 12, 5
    u = rng.normal(size=(B, L, d_inner)).astype(np.float32)
    dt = np.abs(rng.normal(size=(B, L, d_inner))).astype(np.float32) * 0.1
    A = -np.abs(rng.normal(size=(d_inner, d_state))).astype(np.float32)
    Bm = rng.normal(size=(B, L, d_state)).astype(np.float32)
    C = rng.normal(size=(B, L, d_state)).astype(np.float32)
    D = rng.normal(size=(d_inner,)).astype(np.float32)
    h0 = rng.normal(size=(B, d_inner, d_state)).astype(np.float32)
    args = tuple(map(jnp.asarray, (u, dt, A, Bm, C, D, h0)))
    y1, h1 = selective_scan(*args, chunk=chunk)
    y2, h2 = selective_scan_ref(*args)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-4, rtol=1e-4)


def test_selective_scan_step_matches_ref(rng):
    B, L, d_inner, d_state = 1, 10, 6, 4
    u = rng.normal(size=(B, L, d_inner)).astype(np.float32)
    dt = np.abs(rng.normal(size=(B, L, d_inner))).astype(np.float32) * 0.1
    A = -np.abs(rng.normal(size=(d_inner, d_state))).astype(np.float32)
    Bm = rng.normal(size=(B, L, d_state)).astype(np.float32)
    C = rng.normal(size=(B, L, d_state)).astype(np.float32)
    D = rng.normal(size=(d_inner,)).astype(np.float32)
    y_ref, h_ref = selective_scan_ref(*map(jnp.asarray, (u, dt, A, Bm, C, D)))
    h = jnp.zeros((B, d_inner, d_state), jnp.float32)
    ys = []
    for t in range(L):
        h, y = selective_scan_step(
            h, *map(jnp.asarray, (u[:, t], dt[:, t])), jnp.asarray(A),
            *map(jnp.asarray, (Bm[:, t], C[:, t])), jnp.asarray(D)
        )
        ys.append(np.asarray(y))
    ys = np.stack(ys, axis=1)
    np.testing.assert_allclose(ys, np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)


def test_selective_scan_grad_finite(rng):
    B, L, d_inner, d_state = 1, 40, 4, 3
    u = jnp.asarray(rng.normal(size=(B, L, d_inner)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.normal(size=(B, L, d_inner))) * 0.1, jnp.float32)
    A = jnp.asarray(-np.abs(rng.normal(size=(d_inner, d_state))), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(B, L, d_state)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(B, L, d_state)), jnp.float32)

    def loss(A):
        y, _ = selective_scan(u, dt, A, Bm, C, chunk=16)
        return jnp.sum(y**2)

    g = jax.grad(loss)(A)
    assert np.isfinite(np.asarray(g)).all()
