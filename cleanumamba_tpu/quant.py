"""Weight-only int8 quantization for latency-critical streaming.

Single-frame streaming is weight-bandwidth-bound: every 16 ms frame reads
the full parameter set from HBM (docs/performance.md "Streaming").  bf16
weights halve that traffic; int8 halves it again.  This module stores big
weight tensors as symmetric per-channel int8 with fp32 scales and
dequantizes INSIDE the jitted step, so XLA reads int8 from HBM and fuses
the (convert, scale-multiply) chain into each consumer.

Replaces nothing in the reference (it streams fp16 via torch autocast at
best); the int8 path is a TPU-native latency lever (the reference's
quantization-stub hooks in dataset.py hint at the same idea).

Only weight matrices/tensors (float, ndim >= 2, size >= min_size) are
quantized; biases, norms, SSM state params (A_log, D, dt bias) stay fp32 —
they are tiny and their dynamic range matters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# Marker key: a quantized leaf is a dict {_Q_TAG: int8 values, "scale": f32}.
_Q_TAG = "int8_values"


def _quantize_leaf(w):
    """Symmetric per-channel (last axis) int8: scale = max|w| / 127 over all
    leading axes, broadcastable back over the original layout."""
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {_Q_TAG: q, "scale": scale.astype(jnp.float32)}


def _is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and _Q_TAG in leaf


# Leaves never quantized regardless of size: exp()-transformed or
# state-dynamics parameters where log-space rounding error amplifies.
_SENSITIVE_KEYS = ("A_log", "A_real", "A_imag", "inv_dt", "dt_proj_b")


def quantize_params(params, min_size: int = 4096):
    """Quantize every float leaf with ndim >= 2 and size >= min_size, except
    state-dynamics parameters (A_log etc. — their consumers exponentiate,
    amplifying rounding error).

    Returns a pytree of the same structure where selected leaves became
    {int8_values, scale} dicts.  Use :func:`dequantize_params` inside the
    jitted consumer."""

    def q(path, leaf):
        names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        if (
            hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and not names.intersection(_SENSITIVE_KEYS)
        ):
            return _quantize_leaf(jnp.asarray(leaf))
        return leaf

    return jax.tree_util.tree_map_with_path(q, params)


def dequantize_params(params, dtype=jnp.bfloat16):
    """Rebuild a dense-weight pytree from a quantized one (trace-time view:
    under jit, XLA fuses the int8 read + convert + scale into consumers)."""

    def dq(leaf):
        if _is_quantized(leaf):
            return (leaf[_Q_TAG].astype(dtype) * leaf["scale"].astype(dtype))
        return leaf

    return jax.tree_util.tree_map(dq, params, is_leaf=_is_quantized)


def quantization_error(params, qparams) -> float:
    """Max relative per-tensor error (sanity diagnostic)."""
    worst = 0.0
    flat = jax.tree_util.tree_leaves(params)
    deq = jax.tree_util.tree_leaves(dequantize_params(qparams, jnp.float32))
    for a, b in zip(flat, deq):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            denom = float(jnp.max(jnp.abs(a))) + 1e-12
            worst = max(worst, float(jnp.max(jnp.abs(a - b))) / denom)
    return worst
