"""Mamba (selective SSM) bottleneck mixer.

Reimplements, from the math, the pip-dependency ``mamba_ssm`` modules the
reference instantiates via ``create_block`` (reference
src/network/CleanUMamba.py:172-189 with ssm_cfg at :141-152):

    in_proj -> split (x, z) -> causal depthwise conv(K=4) + SiLU
    -> x_proj -> (dt, B, C) -> dt_proj (+bias) -> softplus
    -> selective scan -> y * SiLU(z) -> out_proj

Dims are derived from parameter *shapes* at trace time so the same code runs
ragged channel-pruned checkpoints (survey §6: e.g. layer-0 pruned to
d_inner=8, d_state=8, dt_rank=32) without any per-checkpoint metadata.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cleanumamba_tpu.ops.conv import causal_depthwise_conv
from cleanumamba_tpu.ops.scan import selective_scan_step


def mixer_dims(p):
    """Derive (d_model, d_inner, d_state, dt_rank, d_conv) from param shapes.

    Mirrors the shape-inference in the reference's pruned-checkpoint loader
    (CleanUMamba.py:540-545)."""
    d_inner, dt_rank = p["dt_proj_w"].shape[1], p["dt_proj_w"].shape[0]
    d_state = (p["x_proj"].shape[1] - dt_rank) // 2
    d_model = p["in_proj"].shape[0]
    d_conv = p["conv_w"].shape[0]
    return d_model, d_inner, d_state, dt_rank, d_conv


def mixer_forward(p, x, chunk: int = 32, scan_impl: str = "auto"):
    """Offline forward.  x: (B, T, d_model) -> (B, T, d_model).

    scan_impl: "xla" (chunked associative scan), "pallas" (fused TPU kernel),
    or "auto" (pallas on TPU, xla elsewhere)."""
    _, d_inner, d_state, dt_rank, _ = mixer_dims(p)
    xz = x @ p["in_proj"].astype(x.dtype)  # (B, T, 2*d_inner)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]
    xs = causal_depthwise_conv(xs, p["conv_w"], p["conv_b"])
    xs = jax.nn.silu(xs)
    dbc = xs @ p["x_proj"].astype(xs.dtype)  # (B, T, dt_rank + 2*d_state)
    dt = dbc[..., :dt_rank]
    B = dbc[..., dt_rank : dt_rank + d_state]
    C = dbc[..., dt_rank + d_state :]
    dt = dt @ p["dt_proj_w"].astype(dt.dtype) + p["dt_proj_b"].astype(dt.dtype)
    dt = jax.nn.softplus(dt.astype(jnp.float32))
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    if scan_impl == "auto":
        from cleanumamba_tpu.ops.pallas.selective_scan import pallas_available

        scan_impl = "pallas" if pallas_available() else "xla"
    h0 = jnp.zeros((xs.shape[0], d_inner, d_state), jnp.float32)
    if scan_impl == "pallas":
        from cleanumamba_tpu.ops.pallas.selective_scan import selective_scan_auto

        y, _ = selective_scan_auto(xs, dt, A, B, C, p["D"], h0, chunk)
    else:
        from cleanumamba_tpu.ops.scan import selective_scan_grad

        y, _ = selective_scan_grad(xs, dt, A, B, C, p["D"], h0, chunk)
    y = y * jax.nn.silu(z)
    return y @ p["out_proj"].astype(y.dtype)


def mixer_init_cache(p, batch_size: int, dtype=jnp.float32):
    """Streaming cache (replaces reference allocate_inference_cache_layer,
    CleanUMamba.py:336-349).  conv_state holds the last d_conv inputs,
    ssm_state the fp32 recurrent state."""
    _, d_inner, d_state, _, d_conv = mixer_dims(p)
    return {
        "conv_state": jnp.zeros((batch_size, d_conv, d_inner), dtype),
        "ssm_state": jnp.zeros((batch_size, d_inner, d_state), jnp.float32),
    }


def mixer_step(p, cache, x):
    """Single-token streaming step.  x: (B, d_model) -> (B, d_model).

    Replaces causal_conv1d_update + selective_state_update (reference
    streaming path CleanUMamba.py:451-453)."""
    _, d_inner, d_state, dt_rank, d_conv = mixer_dims(p)
    xz = x @ p["in_proj"].astype(x.dtype)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]
    conv_state = jnp.concatenate([cache["conv_state"][:, 1:], xs[:, None, :]], axis=1)
    xs = jnp.sum(conv_state * p["conv_w"].astype(x.dtype), axis=1) + p["conv_b"].astype(x.dtype)
    xs = jax.nn.silu(xs)
    dbc = xs @ p["x_proj"].astype(xs.dtype)
    dt = dbc[..., :dt_rank]
    B = dbc[..., dt_rank : dt_rank + d_state]
    C = dbc[..., dt_rank + d_state :]
    dt = dt @ p["dt_proj_w"].astype(dt.dtype) + p["dt_proj_b"].astype(dt.dtype)
    dt = jax.nn.softplus(dt.astype(jnp.float32))
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    h, y = selective_scan_step(cache["ssm_state"], xs, dt, A, B, C, p["D"])
    y = y * jax.nn.silu(z)
    out = y @ p["out_proj"].astype(y.dtype)
    return {"conv_state": conv_state, "ssm_state": h}, out


def mixer_init(key, d_model: int, d_inner: int, d_state: int, dt_rank: int,
               d_conv: int = 4, dt_min: float = 0.001, dt_max: float = 0.1,
               dt_init_floor: float = 1e-4, dtype=jnp.float32):
    """Parameter init replicating mamba-ssm's Mamba.__init__ math
    (dt log-uniform in [dt_min, dt_max] -> inverse-softplus bias; A_log =
    log(arange(1..d_state)); torch-Linear uniform fan-in init elsewhere).
    Survey §7 "Mamba init parity"."""
    ks = jax.random.split(key, 6)

    def linear_init(k, fan_in, shape):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    in_proj = linear_init(ks[0], d_model, (d_model, 2 * d_inner))
    x_proj = linear_init(ks[1], d_inner, (d_inner, dt_rank + 2 * d_state))
    # conv1d depthwise: torch init bound = sqrt(groups / (Cin * K)) = sqrt(1/K)
    conv_bound = 1.0 / math.sqrt(d_conv)
    conv_w = jax.random.uniform(ks[2], (d_conv, d_inner), dtype, -conv_bound, conv_bound)
    conv_b = jax.random.uniform(ks[3], (d_inner,), dtype, -conv_bound, conv_bound)
    # dt_proj: weight uniform(+-dt_rank^-0.5) ("random" dt_init)
    dt_init_std = dt_rank**-0.5
    dt_proj_w = jax.random.uniform(ks[4], (dt_rank, d_inner), dtype, -dt_init_std, dt_init_std)
    # dt bias: softplus^{-1}(dt), dt ~ LogUniform[dt_min, dt_max] clamped
    u = jax.random.uniform(ks[5], (d_inner,), jnp.float32)
    dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
    dt = jnp.maximum(dt, dt_init_floor)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))
    A = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32)[None, :], (d_inner, 1))
    return {
        "in_proj": in_proj,
        "conv_w": conv_w,
        "conv_b": conv_b,
        "x_proj": x_proj,
        "dt_proj_w": dt_proj_w,
        "dt_proj_b": inv_dt.astype(dtype),
        "A_log": jnp.log(A).astype(dtype),
        "D": jnp.ones((d_inner,), dtype),
        # out_proj gets the GPT-2-style residual rescale in the model-level
        # init (_init_weights parity, see models/cleanumamba.py).
        "out_proj": jnp.zeros((d_inner, d_model), dtype),
    }
