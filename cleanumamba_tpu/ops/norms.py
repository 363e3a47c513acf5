"""Normalisation ops.

The reference optionally uses Triton fused add+LayerNorm/RMSNorm kernels
(CleanUMamba.py:23-26,292-306).  On TPU, XLA fuses the residual add into the
norm natively, so these are plain jnp implementations with fp32 statistics.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis with fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, scale, eps: float = 1e-5):
    """RMSNorm over the last axis with fp32 statistics."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(ms + eps)) * scale.astype(jnp.float32)
    return y.astype(x.dtype)


def gated_rms_norm(x, z, scale, eps: float = 1e-5):
    """Mamba2's gated RMSNorm: norm(x * silu(z)) with fp32 statistics."""
    import jax

    xf = x.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(ms + eps)) * scale.astype(jnp.float32)
    return y.astype(x.dtype)
