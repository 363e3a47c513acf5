"""Causal multi-head-attention bottleneck (the "CleanUNet" MHA variant).

The reference ships this as a separate network name "CleanUNet" (see
configs/exp/models/DNS-CleanUMamba-FullMiniMambaMHA.json and the
``Experiment_CleanU_MHA.pkl`` checkpoint, whose parameter names —
``tsfm_encoder.layer_stack.{l}.slf_attn.{w_qs,w_ks,w_vs,fc,layer_norm}`` and
``pos_ffn.{w_1,w_2,layer_norm}`` plus ``tsfm_encoder.layer_norm`` —
identify the NVIDIA-CleanUNet post-norm transformer encoder with a causal
(subsequent) mask and no positional encoding).

In the public CleanUNet/attention-is-all-you-need-pytorch encoder the
module-level ``tsfm_encoder.layer_norm`` is applied to the INPUT of the
layer stack (``enc_output = self.layer_norm(enc_output)`` precedes the
``layer_stack`` loop), NOT as a final norm; we store it as ``enc_norm``.
Empirical corroboration on the released ``Experiment_CleanU_MHA.pkl``:
with input-norm placement the converted model's synthetic-bank PESQ-WB
lands at 3.28, inside the Mamba (3.13) / S4 (3.16) cluster as published
(README.md:30-33 has all four within 0.1 MOS); with final-norm placement
it is an impossible outlier at 3.70 (+0.57 over Mamba vs the published
-0.05).  All layer norms use the jadore/CleanUNet eps=1e-6 (set by
config.from_reference_json for the CleanUNet network name).

Per layer (post-norm):
    a   = softmax(QK^T/sqrt(d_k) + causal_mask) V  -> fc -> +residual -> LN
    ffn = W2 relu(W1 a) -> +residual -> LN
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cleanumamba_tpu.ops.norms import layer_norm


def init(key, cfg, dtype=jnp.float32):
    d = cfg.tsfm_d_model
    d_inner = cfg.tsfm_d_inner
    layers = []
    for l in range(cfg.tsfm_n_layers):
        ks = jax.random.split(jax.random.fold_in(key, l), 8)

        def lin(k, fan_in, shape):
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(k, shape, dtype, -bound, bound)

        layers.append(
            {
                "w_qs": lin(ks[0], d, (d, d)),
                "w_ks": lin(ks[1], d, (d, d)),
                "w_vs": lin(ks[2], d, (d, d)),
                "fc": lin(ks[3], d, (d, d)),
                "attn_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                "ffn_w1": lin(ks[4], d, (d, d_inner)),
                "ffn_b1": lin(ks[5], d, (d_inner,)),
                "ffn_w2": lin(ks[6], d_inner, (d_inner, d)),
                "ffn_b2": lin(ks[7], d_inner, (d,)),
                "ffn_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            }
        )
    return {
        "layers": layers,
        "enc_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def _causal_attention(q, k, v, n_head: int):
    B, T, d = q.shape
    d_k = d // n_head
    q = q.reshape(B, T, n_head, d_k).swapaxes(1, 2)  # (B, H, T, dk)
    k = k.reshape(B, T, n_head, d_k).swapaxes(1, 2)
    v = v.reshape(B, T, n_head, d_k).swapaxes(1, 2)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(d_k)
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    return out.swapaxes(1, 2).reshape(B, T, d)


def forward(params, x, cfg):
    """x: (B, T, d_model) -> (B, T, d_model)."""
    eps = cfg.norm_epsilon
    x = layer_norm(x, params["enc_norm"]["scale"], params["enc_norm"]["bias"], eps)
    for p in params["layers"]:
        residual = x
        q = x @ p["w_qs"].astype(x.dtype)
        k = x @ p["w_ks"].astype(x.dtype)
        v = x @ p["w_vs"].astype(x.dtype)
        a = _causal_attention(q, k, v, cfg.tsfm_n_head)
        a = a @ p["fc"].astype(x.dtype)
        x = layer_norm(a + residual, p["attn_norm"]["scale"], p["attn_norm"]["bias"], eps)
        residual = x
        f = jax.nn.relu(x @ p["ffn_w1"].astype(x.dtype) + p["ffn_b1"].astype(x.dtype))
        f = f @ p["ffn_w2"].astype(x.dtype) + p["ffn_b2"].astype(x.dtype)
        x = layer_norm(f + residual, p["ffn_norm"]["scale"], p["ffn_norm"]["bias"], eps)
    return x


def init_cache(params, cfg, batch_size: int, max_len: int, dtype=jnp.float32):
    """KV cache for streaming: grows positions up to max_len (static shape)."""
    d = params["layers"][0]["w_qs"].shape[0]
    n = len(params["layers"])
    return {
        "k": jnp.zeros((n, batch_size, max_len, d), dtype),
        "v": jnp.zeros((n, batch_size, max_len, d), dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def step(params, cfg, cache, x):
    """Single-token streaming step with a ring KV cache.  x: (B, d_model).

    The causal MHA attends to at most ``max_len`` past positions (the cache
    window); beyond that the window slides — matching offline behaviour only
    up to max_len context, which covers the reference's 10 s training crops.
    """
    eps = cfg.norm_epsilon
    n_head = cfg.tsfm_n_head
    max_len = cache["k"].shape[2]
    pos = cache["pos"]
    slot = jnp.mod(pos, max_len)
    new_k, new_v = cache["k"], cache["v"]
    # encoder input norm (per-position, so streaming ≡ offline exactly)
    x = layer_norm(x, params["enc_norm"]["scale"], params["enc_norm"]["bias"], eps)
    for li, p in enumerate(params["layers"]):
        residual = x
        q = x @ p["w_qs"].astype(x.dtype)
        k = x @ p["w_ks"].astype(x.dtype)
        v = x @ p["w_vs"].astype(x.dtype)
        new_k = new_k.at[li, :, :, :].set(
            jax.lax.dynamic_update_slice(new_k[li], k[:, None, :], (0, slot, 0))
        )
        new_v = new_v.at[li, :, :, :].set(
            jax.lax.dynamic_update_slice(new_v[li], v[:, None, :], (0, slot, 0))
        )
        d = q.shape[-1]
        d_k = d // n_head
        B = q.shape[0]
        qh = q.reshape(B, n_head, d_k)
        kh = new_k[li].reshape(B, max_len, n_head, d_k)
        vh = new_v[li].reshape(B, max_len, n_head, d_k)
        logits = jnp.einsum("bhd,bshd->bhs", qh, kh, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(d_k)
        # ring semantics: positions written so far are 0..min(pos, max_len-1)
        idx = jnp.arange(max_len)
        valid = idx <= jnp.minimum(pos, max_len - 1)
        logits = jnp.where(valid[None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhs,bshd->bhd", attn, vh).reshape(B, d)
        a = a @ p["fc"].astype(x.dtype)
        x = layer_norm(a + residual, p["attn_norm"]["scale"], p["attn_norm"]["bias"], eps)
        residual = x
        f = jax.nn.relu(x @ p["ffn_w1"].astype(x.dtype) + p["ffn_b1"].astype(x.dtype))
        f = f @ p["ffn_w2"].astype(x.dtype) + p["ffn_b2"].astype(x.dtype)
        x = layer_norm(f + residual, p["ffn_norm"]["scale"], p["ffn_norm"]["bias"], eps)
    return {"k": new_k, "v": new_v, "pos": pos + 1}, x
