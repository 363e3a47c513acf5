"""LSTM bottleneck variant (reference CleanUMamba.py:158-164).

The reference uses ``nn.LSTM(num_layers=N, hidden=d_model, input=d_model)``
with ``norm_f = Identity`` and no residuals.  Implemented as a stacked
``lax.scan`` with torch gate ordering (i, f, g, o).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def init(key, d_model: int, n_layers: int, dtype=jnp.float32):
    """torch LSTM default init: all params ~ U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / math.sqrt(d_model)
    layers = []
    for l in range(n_layers):
        ks = jax.random.split(jax.random.fold_in(key, l), 4)
        layers.append(
            {
                "w_ih": jax.random.uniform(ks[0], (d_model, 4 * d_model), dtype, -bound, bound),
                "w_hh": jax.random.uniform(ks[1], (d_model, 4 * d_model), dtype, -bound, bound),
                "b_ih": jax.random.uniform(ks[2], (4 * d_model,), dtype, -bound, bound),
                "b_hh": jax.random.uniform(ks[3], (4 * d_model,), dtype, -bound, bound),
            }
        )
    return layers


def _layer_scan(p, x, h0=None, c0=None):
    B, T, H = x.shape[0], x.shape[1], p["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), jnp.float32)
    gates_x = x @ p["w_ih"].astype(x.dtype) + (p["b_ih"] + p["b_hh"]).astype(x.dtype)

    def step(carry, gx):
        h, c = carry
        g = gx + h @ p["w_hh"].astype(h.dtype)
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(o)
        c = f * c.astype(jnp.float32) + (i * gg).astype(jnp.float32)
        h = (o.astype(jnp.float32) * jnp.tanh(c)).astype(gx.dtype)
        return (h, c), h

    (h_last, c_last), ys = lax.scan(step, (h0, c0), gates_x.swapaxes(0, 1))
    return ys.swapaxes(0, 1), (h_last, c_last)


def forward(layers, x):
    """x: (B, T, d_model) -> (B, T, d_model)."""
    for p in layers:
        x, _ = _layer_scan(p, x)
    return x


def init_cache(layers, batch_size: int, dtype=jnp.float32):
    H = layers[0]["w_hh"].shape[0]
    return [
        {"h": jnp.zeros((batch_size, H), dtype), "c": jnp.zeros((batch_size, H), jnp.float32)}
        for _ in layers
    ]


def step(layers, cache, x):
    """Single-token streaming step.  x: (B, d_model)."""
    new_cache = []
    for p, st in zip(layers, cache):
        g = (
            x @ p["w_ih"].astype(x.dtype)
            + st["h"] @ p["w_hh"].astype(x.dtype)
            + (p["b_ih"] + p["b_hh"]).astype(x.dtype)
        )
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f).astype(jnp.float32) * st["c"] + (
            jax.nn.sigmoid(i) * jnp.tanh(gg)
        ).astype(jnp.float32)
        h = (jax.nn.sigmoid(o).astype(jnp.float32) * jnp.tanh(c)).astype(x.dtype)
        new_cache.append({"h": h, "c": c})
        x = h
    return new_cache, x
