"""CleanUMamba: causal time-domain U-Net with a sequence-model bottleneck.

Functional reimplementation of the reference network
(/root/reference/src/network/CleanUMamba.py:30-324), TPU-first:

- activations are channels-last ``(B, L, C)``;
- the strided K=4/S=2 encoder conv and the transposed decoder conv are single
  matmuls (see :mod:`cleanumamba_tpu.ops.conv`) that map straight onto the MXU;
- the Mamba bottleneck runs a chunked associative scan with fp32 state;
- the residual stream through the bottleneck is carried in fp32
  (parity with ``residual_in_fp32=True``, reference CleanUMamba.py:155).

Params are a plain pytree (dict/list of jnp arrays); pruned "ragged"
checkpoints simply produce differently-shaped leaves and everything retraces.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.ops.conv import (
    conv1d,
    conv1d_strided_matmul,
    conv_transpose1d,
    glu_activation,
)
from cleanumamba_tpu.ops.norms import layer_norm, rms_norm
from cleanumamba_tpu.models import bottleneck_mamba
from cleanumamba_tpu.models import bottleneck_lstm
from cleanumamba_tpu.models import bottleneck_mha
from cleanumamba_tpu.models import bottleneck_mamba2
from cleanumamba_tpu.models import bottleneck_s4

Params = Dict[str, Any]

_MIXERS = {
    "mamba": bottleneck_mamba,
    "mamba2": bottleneck_mamba2,
    "mamba_s4": bottleneck_s4,
}


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def encoder_level(p, x, cfg: CleanUMambaConfig, i: int, tap=None):
    """One encoder level: strided conv -> ReLU -> 1x1 -> GLU
    (reference CleanUMamba.py:108-113).  ``tap(name, tensor)`` collects
    activation telemetry at the pruning groups' hook points."""
    groups = cfg.group_of_layer(i)
    K, S = cfg.kernel_size, cfg.stride
    if groups == 1 and K == 2 * S:
        x = conv1d_strided_matmul(x, p["conv_w"], p["conv_b"], stride=S)
    else:
        x = conv1d(x, p["conv_w"], p["conv_b"], stride=S, groups=groups)
    if tap is not None:
        tap(f"enc_conv_{i}", x)
    x = jax.nn.relu(x)
    x = x @ p["mix_w"][0].astype(x.dtype) + p["mix_b"].astype(x.dtype)
    if tap is not None:
        tap(f"enc_out_{i}", x)
    return glu_activation(x, cfg.glu_activation, cfg.bypass_of_layer(i))


def decoder_level(p, x, cfg: CleanUMambaConfig, enc_i: int, relu: bool):
    """One decoder level: 1x1 -> GLU -> ConvTranspose (-> ReLU)
    (reference CleanUMamba.py:121-130)."""
    x = x @ p["mix_w"][0].astype(x.dtype) + p["mix_b"].astype(x.dtype)
    x = glu_activation(x, cfg.glu_activation, cfg.bypass_of_layer(enc_i))
    x = conv_transpose1d(x, p["convt_w"], p["convt_b"], stride=cfg.stride)
    if relu:
        x = jax.nn.relu(x)
    return x


def bottleneck_forward(
    params: Params, x, cfg: CleanUMambaConfig, chunk: int = 32,
    scan_impl: str = "auto", tap=None,
):
    """Bottleneck over (B, T, d_model) features; returns same shape.

    Mamba-family: pre-norm residual blocks with fp32 residual stream +
    final add&norm (reference CleanUMamba.py:285-306).
    LSTM: stacked LSTM, no norm (``norm_f = Identity``, reference :160-164).
    MHA: post-norm transformer encoder (NVIDIA CleanUNet lineage).
    """
    if cfg.bottleneck == "lstm":
        return bottleneck_lstm.forward(params["layers"], x)
    if cfg.bottleneck == "mha":
        return bottleneck_mha.forward(params, x, cfg)
    mixer = _MIXERS[cfg.bottleneck]
    hidden = x
    residual = None
    for l, lp in enumerate(params["layers"]):
        residual = (
            hidden.astype(jnp.float32) + residual
            if residual is not None
            else hidden.astype(jnp.float32)
        )
        if cfg.rms_norm:
            hidden = rms_norm(residual, lp["norm"]["scale"], cfg.norm_epsilon)
        else:
            hidden = layer_norm(
                residual, lp["norm"]["scale"], lp["norm"]["bias"], cfg.norm_epsilon
            )
        hidden = hidden.astype(x.dtype)
        if cfg.bottleneck == "mamba":
            if tap is not None:
                # d_inner group telemetry: in_proj output on the normed input
                # (XLA CSEs this with the matmul inside the mixer)
                tap(f"d_inner_xz_{l}", hidden @ lp["mixer"]["in_proj"].astype(hidden.dtype))
            hidden = mixer.mixer_forward(lp["mixer"], hidden, chunk=chunk, scan_impl=scan_impl)
        else:
            hidden = mixer.mixer_forward(lp["mixer"], hidden, chunk=chunk)
    residual = hidden.astype(jnp.float32) + residual
    nf = params["norm_f"]
    if cfg.rms_norm:
        out = rms_norm(residual, nf["scale"], cfg.norm_epsilon)
    else:
        out = layer_norm(residual, nf["scale"], nf["bias"], cfg.norm_epsilon)
    return out.astype(x.dtype)


def forward(
    params: Params,
    noisy: jnp.ndarray,
    cfg: CleanUMambaConfig,
    return_skips: bool = False,
    chunk: int = 32,
    scan_impl: str = "auto",
):
    """Offline denoising forward (reference CleanUMamba.forward :252-324).

    noisy: (B, L) or (B, 1, L) or (B, L, 1) raw waveform.
    Returns denoised (B, L) waveform (plus skip activations if requested).
    """
    if noisy.ndim == 3:
        # accept both torch-style (B, 1, L) and channels-last (B, L, 1)
        noisy = noisy.reshape(noisy.shape[0], -1)
    B, L = noisy.shape
    x = noisy[..., None]  # (B, L, 1)

    if cfg.normalize_input:
        std = jnp.std(x, axis=1, keepdims=True) + 1e-3
        x = x / std

    Lv = cfg.valid_length(L)
    x = jnp.pad(x, ((0, 0), (0, Lv - L), (0, 0)))

    skips = []
    for i, ep in enumerate(params["encoder"]):
        x = encoder_level(ep, x, cfg, i)
        skips.append(x)
    if cfg.residual_projection:
        skips = [
            s @ rp["w"][0].astype(s.dtype) + rp["b"].astype(s.dtype)
            for s, rp in zip(skips, params["residual_projection"])
        ]
    skips = skips[::-1]

    x = x @ params["tsfm_conv1"]["w"][0].astype(x.dtype) + params["tsfm_conv1"]["b"].astype(x.dtype)
    tsfm_out = bottleneck_forward(params["bottleneck"], x, cfg, chunk=chunk, scan_impl=scan_impl)
    x = tsfm_out @ params["tsfm_conv2"]["w"][0].astype(x.dtype) + params["tsfm_conv2"]["b"].astype(x.dtype)

    n_dec = len(params["decoder"])
    for j, dp in enumerate(params["decoder"]):
        skip = skips[j]
        x = x + skip[:, : x.shape[1], :]
        enc_i = n_dec - 1 - j
        x = decoder_level(dp, x, cfg, enc_i, relu=(j != n_dec - 1))

    y = x[:, :L, 0]
    if cfg.normalize_input:
        y = y * std[:, 0, :]
    if return_skips:
        return y, skips + [tsfm_out]
    return y


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _torch_conv_init(key, k_size, cin, cout, groups=1, dtype=jnp.float32):
    """torch Conv1d default init + weight_scaling_init (util.py:174-181):
    uniform(+-sqrt(groups/(cin*K))), then w,b /= sqrt(10*std(w))."""
    kw, kb = jax.random.split(key)
    bound = math.sqrt(groups / (cin * k_size))
    w = jax.random.uniform(kw, (k_size, cin // groups, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    alpha = 10.0 * jnp.std(w)
    scale = 1.0 / jnp.sqrt(alpha)
    return (w * scale).astype(dtype), (b * scale).astype(dtype)


def init_params(
    key, cfg: CleanUMambaConfig, dtype=jnp.float32
) -> Params:
    """Initialise the full parameter pytree.

    Parity: torch defaults + ``weight_scaling_init`` on every conv
    (reference CleanUMamba.py:197-199) + mamba-ssm ``_init_weights``
    residual rescale of each mixer's out_proj (reference :201-206).
    """
    D = cfg.encoder_n_layers
    keys = jax.random.split(key, 4 * D + cfg.tsfm_n_layers + 8)
    ki = iter(range(len(keys)))

    encoder = []
    decoder_rev = []
    resproj = []
    cin = cfg.channels_input
    cout_dec = cfg.channels_output
    h = cfg.channels_H
    for i in range(D):
        g = cfg.group_of_layer(i)
        bp = cfg.bypass_of_layer(i)
        mix_out = bp + (h - bp) * 2
        cw, cb = _torch_conv_init(keys[next(ki)], cfg.kernel_size, cin, h, g, dtype)
        mw, mb = _torch_conv_init(keys[next(ki)], 1, h, mix_out, 1, dtype)
        encoder.append({"conv_w": cw, "conv_b": cb, "mix_w": mw, "mix_b": mb})
        if cfg.residual_projection:
            rw, rb = _torch_conv_init(keys[next(ki)], 1, h, h, 1, dtype)
            resproj.append({"w": rw, "b": rb})
        dmw, dmb = _torch_conv_init(keys[next(ki)], 1, h, mix_out, 1, dtype)
        # ConvTranspose1d weight is (Cin, Cout, K) in torch; its fan-in for
        # the default init is Cout*K (torch _calculate_fan_in_and_fan_out on
        # dims 1 and 2), and the bias has Cout entries.
        ktw, ktb = jax.random.split(keys[next(ki)])
        t_bound = math.sqrt(1.0 / (cout_dec * cfg.kernel_size))
        tw = jax.random.uniform(
            ktw, (cfg.kernel_size, h, cout_dec), jnp.float32, -t_bound, t_bound
        )
        tb = jax.random.uniform(ktb, (cout_dec,), jnp.float32, -t_bound, t_bound)
        t_scale = 1.0 / jnp.sqrt(10.0 * jnp.std(tw))
        tw, tb = (tw * t_scale).astype(dtype), (tb * t_scale).astype(dtype)
        decoder_rev.append({"mix_w": dmw, "mix_b": dmb, "convt_w": tw, "convt_b": tb})
        cin = h
        cout_dec = h
        h = min(2 * h, cfg.max_H)

    decoder = decoder_rev[::-1]

    c_enc_out = cin  # channels at the deepest encoder level
    c1w, c1b = _torch_conv_init(keys[next(ki)], 1, c_enc_out, cfg.tsfm_d_model, 1, dtype)
    c2w, c2b = _torch_conv_init(keys[next(ki)], 1, cfg.tsfm_d_model, c_enc_out, 1, dtype)

    bottleneck = _init_bottleneck(keys[next(ki)], cfg, dtype)

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "tsfm_conv1": {"w": c1w, "b": c1b},
        "bottleneck": bottleneck,
        "tsfm_conv2": {"w": c2w, "b": c2b},
    }
    if cfg.residual_projection:
        params["residual_projection"] = resproj
    return params


def _init_bottleneck(key, cfg: CleanUMambaConfig, dtype) -> Params:
    n = cfg.tsfm_n_layers
    keys = jax.random.split(key, n + 1)
    if cfg.bottleneck == "lstm":
        return {"layers": bottleneck_lstm.init(keys[0], cfg.tsfm_d_model, n, dtype)}
    if cfg.bottleneck == "mha":
        return bottleneck_mha.init(keys[0], cfg, dtype)

    layers = []
    for l in range(n):
        if cfg.bottleneck == "mamba":
            mixer = bottleneck_mamba.mixer_init(
                keys[l], cfg.tsfm_d_model, cfg.d_inner, cfg.d_state,
                cfg.dt_rank, cfg.d_conv, dtype=dtype,
            )
            # _init_weights (mamba-ssm mixer_seq_simple): out_proj kaiming
            # uniform then / sqrt(n_residuals_per_layer * n_layer)
            kk = jax.random.fold_in(keys[l], 1337)
            bound = 1.0 / math.sqrt(cfg.d_inner)
            out = jax.random.uniform(
                kk, (cfg.d_inner, cfg.tsfm_d_model), jnp.float32, -bound, bound
            ) / math.sqrt(n)
            mixer["out_proj"] = out.astype(dtype)
        elif cfg.bottleneck == "mamba2":
            mixer = bottleneck_mamba2.mixer_init(keys[l], cfg, dtype=dtype)
        elif cfg.bottleneck == "mamba_s4":
            mixer = bottleneck_s4.mixer_init(keys[l], cfg, dtype=dtype)
        else:
            raise ValueError(cfg.bottleneck)
        norm = {"scale": jnp.ones((cfg.tsfm_d_model,), dtype)}
        if not cfg.rms_norm:
            norm["bias"] = jnp.zeros((cfg.tsfm_d_model,), dtype)
        layers.append({"norm": norm, "mixer": mixer})
    norm_f = {"scale": jnp.ones((cfg.tsfm_d_model,), dtype)}
    if not cfg.rms_norm:
        norm_f["bias"] = jnp.zeros((cfg.tsfm_d_model,), dtype)
    return {"layers": layers, "norm_f": norm_f}


def forward_with_telemetry(params: Params, noisy, cfg: CleanUMambaConfig,
                           chunk: int = 32):
    """Forward that also returns per-channel activation variances at the
    pruning groups' telemetry points (replaces the reference's forward hooks,
    pruninggroup.py:79-158).  Returns (denoised, {tap_name: var (C,)})."""
    taps: Dict[str, Any] = {}

    def tap(name, x):
        xf = x.astype(jnp.float32)
        taps[name] = jnp.var(xf.reshape(-1, xf.shape[-1]), axis=0)

    if noisy.ndim == 3:
        noisy = noisy.reshape(noisy.shape[0], -1)
    B, L = noisy.shape
    x = noisy[..., None]
    if cfg.normalize_input:
        std = jnp.std(x, axis=1, keepdims=True) + 1e-3
        x = x / std
    Lv = cfg.valid_length(L)
    x = jnp.pad(x, ((0, 0), (0, Lv - L), (0, 0)))
    skips = []
    for i, ep in enumerate(params["encoder"]):
        x = encoder_level(ep, x, cfg, i, tap=tap)
        skips.append(x)
    skips = skips[::-1]
    x = x @ params["tsfm_conv1"]["w"][0].astype(x.dtype) + params["tsfm_conv1"]["b"].astype(x.dtype)
    tap("d_model_in", x)
    tsfm_out = bottleneck_forward(params["bottleneck"], x, cfg, chunk=chunk, tap=tap)
    x = tsfm_out @ params["tsfm_conv2"]["w"][0].astype(x.dtype) + params["tsfm_conv2"]["b"].astype(x.dtype)
    n_dec = len(params["decoder"])
    for j, dp in enumerate(params["decoder"]):
        x = x + skips[j][:, : x.shape[1], :]
        enc_i = n_dec - 1 - j
        mix = x @ dp["mix_w"][0].astype(x.dtype) + dp["mix_b"].astype(x.dtype)
        tap(f"dec_mix_{j}", mix)
        x = glu_activation(mix, cfg.glu_activation, cfg.bypass_of_layer(enc_i))
        x = conv_transpose1d(x, dp["convt_w"], dp["convt_b"], stride=cfg.stride)
        if j != n_dec - 1:
            x = jax.nn.relu(x)
    y = x[:, :L, 0]
    if cfg.normalize_input:
        y = y * std[:, 0, :]
    return y, taps


def count_params(params) -> int:
    return sum(
        int(x.size)
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")  # skip python-int metadata (e.g. S4 l_kernel)
    )


def prepare_for_length(params: Params, cfg: CleanUMambaConfig, L: int) -> Params:
    """Make params valid for inputs of length L.

    For the Mamba-S4 bottleneck this extends each layer's attuned kernel
    length (host-side doubling transform) to cover the bottleneck sequence
    length; a no-op for other bottlenecks."""
    if cfg.bottleneck != "mamba_s4":
        return params
    from cleanumamba_tpu.models.bottleneck_s4 import extend_kernel_length

    bott_len = cfg.valid_length(L) // cfg.total_stride
    for l, layer in enumerate(params["bottleneck"]["layers"]):
        layer["mixer"]["kernel"] = extend_kernel_length(
            layer["mixer"]["kernel"], bott_len
        )
    return params
