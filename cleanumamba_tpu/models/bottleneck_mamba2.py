"""Mamba2 (SSD) bottleneck mixer (reference ``mamba_v2`` flag,
CleanUMamba.py:146-149, ssm_cfg layer="Mamba2", headdim=d_model/n_head).

Geometry derived from the released ``Experiment_CleanU_Mamba2.pkl``:
    in_proj: (d_model, 2*d_inner + 2*ngroups*d_state + n_heads)
    conv1d over xBC = (d_inner + 2*ngroups*d_state) channels
    per-head scalar A (A_log: (n_heads,)), dt_bias: (n_heads,), D: (n_heads,)
    gated RMSNorm before out_proj.

The scalar-per-head decay makes the scan a special case of the Mamba1
selective scan with ``A[i, s] = a_head(i)`` broadcast, so we reuse the same
chunked associative scan with the state expanded to (d_inner, d_state).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cleanumamba_tpu.ops.conv import causal_depthwise_conv
from cleanumamba_tpu.ops.norms import gated_rms_norm
from cleanumamba_tpu.ops.scan import selective_scan, selective_scan_step


def mixer_geometry(p):
    n_heads = p["A_log"].shape[0]
    d_in_total = p["in_proj"].shape[1]
    d_conv_channels = p["conv_w"].shape[1]
    d_model = p["in_proj"].shape[0]
    d_inner = p["out_proj"].shape[0]
    headdim = d_inner // n_heads
    # xBC = d_inner + 2 * ngroups * d_state ; zxbcdt = 2*d_inner + 2*g*ds + nh
    two_gds = d_conv_channels - d_inner
    d_state = two_gds // 2  # ngroups = 1 in the reference config
    return d_model, d_inner, d_state, n_heads, headdim


def _split_zxbcdt(p, zxbcdt):
    d_model, d_inner, d_state, n_heads, headdim = mixer_geometry(p)
    z = zxbcdt[..., :d_inner]
    xBC = zxbcdt[..., d_inner : 2 * d_inner + 2 * d_state]
    dt = zxbcdt[..., 2 * d_inner + 2 * d_state :]
    return z, xBC, dt


def mixer_forward(p, x, chunk: int = 32, use_ssd: bool = True):
    d_model, d_inner, d_state, n_heads, headdim = mixer_geometry(p)
    zxbcdt = x @ p["in_proj"].astype(x.dtype)
    z, xBC, dt_h = _split_zxbcdt(p, zxbcdt)
    xBC = causal_depthwise_conv(xBC, p["conv_w"], p["conv_b"])
    xBC = jax.nn.silu(xBC)
    xs = xBC[..., :d_inner]
    B = xBC[..., d_inner : d_inner + d_state]
    C = xBC[..., d_inner + d_state :]
    dt_h = jax.nn.softplus(dt_h.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    A_head = -jnp.exp(p["A_log"].astype(jnp.float32))  # (n_heads,)
    if use_ssd:
        # scalar-per-head decay -> masked-matmul SSD form (MXU); custom VJP
        # (the backward is the transposed masked matmul — AD through the
        # chunked forward would save every (T, T, H) decay mask as residual)
        from cleanumamba_tpu.ops.scan import ssd_scan_grad

        Bsz, T, _ = xs.shape
        xh = xs.reshape(Bsz, T, n_heads, headdim)
        y, _ = ssd_scan_grad(xh, dt_h, A_head, B, C, p["D"], None,
                             min(chunk * 2, 64))
        y = y.reshape(Bsz, T, d_inner)
    else:
        # exact-equivalent fallback: broadcast per-head params to the shared
        # elementwise selective scan
        dt = jnp.repeat(dt_h, headdim, axis=-1)  # (B, T, d_inner)
        A = jnp.repeat(A_head, headdim)[:, None] * jnp.ones((1, d_state), jnp.float32)
        D = jnp.repeat(p["D"].astype(jnp.float32), headdim)
        y, _ = selective_scan(xs, dt, A, B, C, D, chunk=chunk)
    y = gated_rms_norm(y, z, p["norm_w"])
    return y @ p["out_proj"].astype(y.dtype)


def mixer_init_cache(p, batch_size: int, dtype=jnp.float32):
    d_model, d_inner, d_state, n_heads, headdim = mixer_geometry(p)
    d_conv = p["conv_w"].shape[0]
    return {
        "conv_state": jnp.zeros((batch_size, d_conv, d_inner + 2 * d_state), dtype),
        "ssm_state": jnp.zeros((batch_size, d_inner, d_state), jnp.float32),
    }


def mixer_step(p, cache, x):
    d_model, d_inner, d_state, n_heads, headdim = mixer_geometry(p)
    zxbcdt = x @ p["in_proj"].astype(x.dtype)
    z, xBC, dt_h = _split_zxbcdt(p, zxbcdt)
    conv_state = jnp.concatenate([cache["conv_state"][:, 1:], xBC[:, None, :]], axis=1)
    xBC = jnp.sum(conv_state * p["conv_w"].astype(x.dtype), axis=1) + p["conv_b"].astype(x.dtype)
    xBC = jax.nn.silu(xBC)
    xs = xBC[..., :d_inner]
    B = xBC[..., d_inner : d_inner + d_state]
    C = xBC[..., d_inner + d_state :]
    dt_h = jax.nn.softplus(dt_h.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    dt = jnp.repeat(dt_h, headdim, axis=-1)
    A_head = -jnp.exp(p["A_log"].astype(jnp.float32))
    A = jnp.repeat(A_head, headdim)[:, None] * jnp.ones((1, d_state), jnp.float32)
    D = jnp.repeat(p["D"].astype(jnp.float32), headdim)
    h, y = selective_scan_step(cache["ssm_state"], xs, dt, A, B, C, D)
    y = gated_rms_norm(y, z, p["norm_w"])
    out = y @ p["out_proj"].astype(y.dtype)
    return {"conv_state": conv_state, "ssm_state": h}, out


def mixer_init(key, cfg, dtype=jnp.float32, dt_min=0.001, dt_max=0.1,
               dt_init_floor=1e-4, A_init_range=(1, 16)):
    """mamba-ssm Mamba2.__init__ parity: per-head A ~ U[1,16] (log-stored),
    dt bias inverse-softplus of log-uniform dt, conv/linear torch defaults."""
    d_model = cfg.tsfm_d_model
    d_inner = cfg.d_inner
    d_state = cfg.d_state
    headdim = cfg.tsfm_d_model // cfg.tsfm_n_head
    n_heads = d_inner // headdim
    d_conv = cfg.d_conv
    conv_dim = d_inner + 2 * d_state
    in_dim = 2 * d_inner + 2 * d_state + n_heads
    ks = jax.random.split(key, 6)

    def lin(k, fan_in, shape):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    conv_bound = 1.0 / math.sqrt(d_conv)
    u = jax.random.uniform(ks[2], (n_heads,), jnp.float32)
    dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
    dt = jnp.maximum(dt, dt_init_floor)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))
    A = jax.random.uniform(ks[3], (n_heads,), jnp.float32, A_init_range[0], A_init_range[1])
    out_bound = 1.0 / math.sqrt(d_inner)
    out = jax.random.uniform(ks[4], (d_inner, d_model), jnp.float32, -out_bound, out_bound)
    out = out / math.sqrt(cfg.tsfm_n_layers)
    return {
        "in_proj": lin(ks[0], d_model, (d_model, in_dim)),
        "conv_w": jax.random.uniform(ks[1], (d_conv, conv_dim), dtype, -conv_bound, conv_bound),
        "conv_b": jax.random.uniform(
            jax.random.fold_in(ks[1], 1), (conv_dim,), dtype, -conv_bound, conv_bound
        ),
        "dt_bias": inv_dt.astype(dtype),
        "A_log": jnp.log(A).astype(dtype),
        "D": jnp.ones((n_heads,), dtype),
        "norm_w": jnp.ones((d_inner,), dtype),
        "out_proj": out.astype(dtype),
    }
