"""1-D convolution ops, channels-last, designed for the TPU MXU.

The reference uses cuDNN Conv1d/ConvTranspose1d in NCL layout
(/root/reference/src/network/CleanUMamba.py:108-130).  Here everything is
``(B, L, C)`` and the hot encoder/decoder convolutions are expressed as plain
matmuls over gathered windows, which XLA tiles directly onto the 128x128
systolic array without layout shuffles.

Weight conventions (what :mod:`cleanumamba_tpu.convert` produces):

- ``conv1d``:           w ``(K, Cin, Cout)``  (torch Conv1d is ``(Cout, Cin, K)``)
- ``conv_transpose1d``: w ``(K, Cin, Cout)``  (torch ConvTranspose1d is ``(Cin, Cout, K)``)
- ``causal_depthwise_conv``: w ``(K, C)``     (torch depthwise is ``(C, 1, K)``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d(x, w, b=None, stride: int = 1, groups: int = 1):
    """Valid (no padding) 1-D convolution.  x: (B, L, Cin), w: (K, Cin//groups, Cout).

    Matches torch ``nn.Conv1d(Cin, Cout, K, stride, groups)`` with no padding
    (the reference encoder conv, CleanUMamba.py:109).
    """
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHC", "HIO", "NHC"))
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv1d_strided_matmul(x, w, b=None, stride: int = 2):
    """K=2*stride strided conv as a single matmul (MXU-friendly).

    Specialised for the U-Net encoder's K=4, S=2 geometry (K == 2*S): output
    position t consumes input window [S*t, S*t+K).  We reshape the input into
    S-sample groups and concatenate two adjacent groups per output step, so
    the whole conv is one ``(B*T, K*Cin) @ (K*Cin, Cout)`` matmul.
    """
    K, Cin, Cout = w.shape
    S = stride
    assert K == 2 * S, (K, S)
    B, L, C = x.shape
    T = (L - K) // S + 1  # number of output positions
    # groups g[t] = x[S*t : S*t+S]; window t = concat(g[t], g[t+1])
    n_groups = T + 1
    xg = x[:, : n_groups * S, :].reshape(B, n_groups, S * C)
    win = jnp.concatenate([xg[:, :-1, :], xg[:, 1:, :]], axis=-1)  # (B, T, K*C)
    wm = w.reshape(K * Cin, Cout).astype(x.dtype)
    y = jnp.einsum("btk,kc->btc", win, wm, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose1d(x, w, b=None, stride: int = 2):
    """Transposed 1-D conv matching torch ``nn.ConvTranspose1d`` (no padding).

    x: (B, T, Cin), w: (K, Cin, Cout) -> (B, (T-1)*S + K, Cout).

    Implemented as one matmul producing all K taps per step followed by a
    static overlap-add (the decoder's K=4, S=2 geometry means exactly two
    contributions overlap, reference CleanUMamba.py:124).
    """
    K, Cin, Cout = w.shape
    S = stride
    B, T, C = x.shape
    assert C == Cin
    # z[b, t, k, co] = sum_ci x[b,t,ci] w[k,ci,co]
    z = jnp.einsum(
        "btc,kco->btko", x, w.astype(x.dtype), preferred_element_type=x.dtype
    )  # (B, T, K, Cout)
    out_len = (T - 1) * S + K
    if K == 2 * S:
        # out group u (S samples) = z[u, :S] + z[u-1, S:]
        lo = z[:, :, :S, :]  # (B, T, S, Cout)
        hi = z[:, :, S:, :]
        zeros = jnp.zeros_like(lo[:, :1])
        lo = jnp.concatenate([lo, zeros], axis=1)  # groups 0..T
        hi = jnp.concatenate([zeros, hi], axis=1)  # shifted by one group
        y = (lo + hi).reshape(B, (T + 1) * S, Cout)
        y = y[:, :out_len, :]
    else:
        # generic scatter-add fallback
        y = jnp.zeros((B, out_len, Cout), x.dtype)
        for k in range(K):
            y = y.at[:, k : k + (T - 1) * S + 1 : S, :].add(z[:, :, k, :])
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_depthwise_conv(x, w, b=None):
    """Causal depthwise conv, x: (B, L, C), w: (K, C).

    Equals torch ``Conv1d(C, C, K, groups=C, padding=K-1)`` followed by
    truncation to L (the Mamba d_conv=4 prologue, mamba-ssm causal_conv1d).
    Small K: unrolled shifted adds, fused on the VPU.
    """
    K, C = w.shape
    B, L, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    y = jnp.zeros_like(x)
    for k in range(K):
        y = y + xp[:, k : k + L, :] * w[k].astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def glu_activation(x, activation: str = "Sigmoid", bypass_channels: int = 0):
    """GLU with optional un-gated bypass channels (reference layers.py:6-41).

    x: (..., nX + 2*nAB) -> (..., nX + nAB), out = cat([X, A * act(B)]).
    """
    act = {
        "Sigmoid": jax.nn.sigmoid,
        "ReLU": jax.nn.relu,
        "SiLU": jax.nn.silu,
        "GELU": jax.nn.gelu,
    }[activation]
    nX = bypass_channels
    nAB = (x.shape[-1] - nX) // 2
    if nX == 0:
        a = x[..., :nAB]
        g = x[..., nAB:]
        return a * act(g)
    bypass = x[..., :nX]
    a = x[..., nX : nX + nAB]
    g = x[..., nX + nAB :]
    return jnp.concatenate([bypass, a * act(g)], axis=-1)
