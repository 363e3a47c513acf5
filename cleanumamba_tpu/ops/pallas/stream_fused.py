"""Fused per-level Pallas kernels for the single-frame streaming step.

Single-frame (block=1) streaming is weight-bandwidth-bound: each 16 ms frame
reads every weight from HBM while the per-level token counts are tiny
(1..128 at E8), so the MXU is idle and the measured step time sits well
above the pure-traffic floor — the gap is per-op dispatch: the XLA step
issues ~8 small kernels per U-Net level (GEMM, bias, GLU slices, convT
GEMM, overlap-add shifts, relu), each a few microseconds of fixed cost
(docs/performance.md "Where the next factor comes from", items 2-3; replaces
the latency role of the reference's cuDNN per-layer streaming path,
/root/reference/src/network/CleanUMamba.py:420-484).

These kernels collapse each level into ONE ``pallas_call`` whose weights are
DMA'd HBM->VMEM once per call and consumed in-register:

- :func:`fused_encoder_level` — window GEMM -> ReLU -> 1x1 mix -> GLU.
- :func:`fused_decoder_level` — skip-add -> 1x1 mix -> GLU -> ConvT ->
  bias/overlap-add -> tail extraction, in a *grouped* output layout
  ``(B, T, S*Cout)`` (S consecutive output samples flattened into lanes) so
  every slice the kernel takes is lane-aligned; the caller reshapes to
  ``(B, T*S, Cout)`` which XLA fuses into the next level's input.

No kernel ever slices along the lane (minor) dimension: the GLU is packed
as TWO weight matrices (value half / gate half) and the K=2S transposed
conv as TWO matrices (the k<S "lo" taps that land in this frame and the
k>=S "hi" taps that overlap into the next), so the reference model's
ragged, non-128 channel counts (the flagship E8 tops out at 64 channels;
pruned checkpoints are arbitrary) lower cleanly — Mosaic pads lanes to the
hardware tile internally, and at these sizes the step is dispatch-bound,
not MXU-bound, so the padding waste is irrelevant.

Weights are packed once at ``Streamer`` init (:func:`pack_decoder_level`,
:func:`pack_encoder_level`) in fp32, bf16, or weight-only int8 (the
``quant.py`` format: per-out-channel symmetric scales); int8 is dequantized
in-register after the VMEM load, so HBM sees true int8 traffic — unlike the
XLA path, where the dequant materialises upstream of the GEMM.  Each pack
splits into ``(arrays, meta)``: *arrays* is a plain pytree of device
buffers that rides through ``jax.jit`` as an argument; *meta* is static
Python (shapes, activation name) closed over by the jitted step.

Applicability (static, checked by the pack_* helpers — callers fall back to
the XLA path when packing returns None): bypass_channels == 0, K == 2*S,
groups == 1 — the released CleanUMamba geometry; every level of every
released checkpoint (full and pruned) packs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cleanumamba_tpu.quant import _Q_TAG

_ACTS = {
    "Sigmoid": jax.nn.sigmoid,
    "ReLU": jax.nn.relu,
    "SiLU": jax.nn.silu,
    "GELU": jax.nn.gelu,
}


def _is_q(leaf) -> bool:
    return isinstance(leaf, dict) and _Q_TAG in leaf


def _shape(w):
    return w[_Q_TAG].shape if _is_q(w) else w.shape


# The kernels hold every weight of a level in VMEM at once (that's the
# point: one DMA, zero re-reads).  TPU scoped VMEM is ~16 MiB; leave
# headroom for activations (≤128 tokens/frame at E8), Mosaic's lane padding
# of ragged widths, and the accumulators.  Levels above the budget return
# None from pack_* and stay on the XLA path — at E8-full/fp32 that is the
# three widest encoder/decoder levels, whose GEMMs are big enough that
# dispatch overhead is not their bottleneck anyway.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _pack_bytes(arrays) -> int:
    def pad128(n):  # minor dim pads to the 128-lane tile
        return -(-n // 128) * 128

    return sum(a.shape[0] * pad128(a.shape[-1]) * a.dtype.itemsize
               for a in arrays.values())


# --------------------------------------------------------------------------
# Weight packing (once, at Streamer init)
# --------------------------------------------------------------------------

def _pack_matrix(arrays, key, w, compute_dtype, cols=None):
    """Store matrix ``w`` (dense 2-D array or quant.py int8 dict) under
    ``key``; int8 keeps its (1, N) fp32 per-column scale under
    ``key + '_scale'``.  ``cols = (lo, hi)`` stores only that column range
    (and the matching scale slice)."""
    if _is_q(w):
        q, s = w[_Q_TAG], w["scale"].reshape(1, -1).astype(jnp.float32)
        if cols is not None:
            q, s = q[:, cols[0]: cols[1]], s[:, cols[0]: cols[1]]
        arrays[key] = q
        arrays[key + "_scale"] = s
    else:
        if cols is not None:
            w = w[:, cols[0]: cols[1]]
        arrays[key] = w.astype(compute_dtype)


def _pack_glu(arrays, mix_w, mix_b, C2, compute_dtype):
    """Split the 1x1 GLU mix (···, C2) into value/gate halves so the kernel
    never lane-slices: y = (x@mwa + mba) * act(x@mwb + mbb)."""
    nAB = C2 // 2
    mw = mix_w
    if _is_q(mw):
        mw = {_Q_TAG: mw[_Q_TAG].reshape(-1, C2), "scale": mw["scale"]}
    else:
        mw = mw.reshape(-1, C2)
    _pack_matrix(arrays, "mwa", mw, compute_dtype, cols=(0, nAB))
    _pack_matrix(arrays, "mwb", mw, compute_dtype, cols=(nAB, C2))
    mb = mix_b.reshape(1, C2).astype(jnp.float32)
    arrays["mba"] = mb[:, :nAB]
    arrays["mbb"] = mb[:, nAB:]


def pack_encoder_level(ep, cfg, i, compute_dtype=jnp.bfloat16,
                       budget=_VMEM_BUDGET_BYTES):
    """Pack one encoder level for :func:`fused_encoder_level`.

    Returns (arrays, meta) or None when the level doesn't meet the kernel's
    static constraints (caller keeps the XLA path for that level).
    """
    K, S = cfg.kernel_size, cfg.stride
    if cfg.bypass_of_layer(i) != 0 or K != 2 * S or cfg.group_of_layer(i) != 1:
        return None
    Kw, Cin, C = _shape(ep["conv_w"])
    C2 = _shape(ep["mix_w"])[-1]

    arrays = {}
    cw = ep["conv_w"]
    if _is_q(cw):
        cw = {_Q_TAG: cw[_Q_TAG].reshape(Kw * Cin, C), "scale": cw["scale"].reshape(1, C)}
    else:
        cw = cw.reshape(Kw * Cin, C)
    _pack_matrix(arrays, "cw", cw, compute_dtype)
    arrays["cb"] = ep["conv_b"].reshape(1, C).astype(jnp.float32)
    _pack_glu(arrays, ep["mix_w"], ep["mix_b"], C2, compute_dtype)
    if _pack_bytes(arrays) > budget:
        return None
    meta = {"K": K, "S": S, "Cin": Cin, "C": C, "C2": C2,
            "act": cfg.glu_activation, "cdt": compute_dtype}
    return arrays, meta


def pack_decoder_level(dp, cfg, enc_i, compute_dtype=jnp.bfloat16,
                       budget=_VMEM_BUDGET_BYTES):
    """Pack one decoder level for :func:`fused_decoder_level`.

    convT weight (K, C, Cout), K == 2*S, splits into the "lo" taps
    (k < S: output samples emitted inside the current token's stride) and
    the "hi" taps (k >= S: samples that overlap-add into the NEXT token),
    each re-laid-out to (C, S*Cout) so the whole transposed conv is two
    GEMMs with no in-kernel lane slicing; per-Cout int8 scales tile S times
    to match.  The convT bias tiles S times into the grouped lane layout.
    Returns (arrays, meta) or None when static constraints fail.
    """
    K, S = cfg.kernel_size, cfg.stride
    if cfg.bypass_of_layer(enc_i) != 0 or K != 2 * S:
        return None
    Kw, C, Cout = _shape(dp["convt_w"])
    C2 = _shape(dp["mix_w"])[-1]

    arrays = {}
    _pack_glu(arrays, dp["mix_w"], dp["mix_b"], C2, compute_dtype)

    ctw = dp["convt_w"]

    def _relayout(x):  # (K, C, Cout) -> (C, K*Cout), columns k*Cout+cout
        return jnp.transpose(x, (1, 0, 2)).reshape(C, Kw * Cout)

    half = S * Cout
    if _is_q(ctw):
        full = {_Q_TAG: _relayout(ctw[_Q_TAG]),
                "scale": jnp.tile(ctw["scale"].reshape(1, Cout), (1, Kw))}
        _pack_matrix(arrays, "cwlo", full, compute_dtype, cols=(0, half))
        _pack_matrix(arrays, "cwhi", full, compute_dtype, cols=(half, 2 * half))
    else:
        full = _relayout(ctw)
        arrays["cwlo"] = full[:, :half].astype(compute_dtype)
        arrays["cwhi"] = full[:, half:].astype(compute_dtype)
    arrays["cb_tiled"] = jnp.tile(
        dp["convt_b"].reshape(1, Cout), (1, S)).astype(jnp.float32)
    if _pack_bytes(arrays) > budget:
        return None
    meta = {"K": K, "S": S, "C": C, "C2": C2, "Cout": Cout,
            "act": cfg.glu_activation, "cdt": compute_dtype}
    return arrays, meta


def pack_stream_params(params, cfg, compute_dtype=jnp.bfloat16,
                       budget=_VMEM_BUDGET_BYTES):
    """Pack every encoder/decoder level that meets the kernels' static
    constraints.  Returns ``(arrays, meta)`` parallel trees with ``None`` at
    unpackable levels (the streaming step keeps the XLA path there): *arrays*
    is a plain pytree passed through ``jax.jit`` as an argument, *meta* is
    static Python closed over by the jitted step."""
    D = cfg.encoder_n_layers
    enc = [pack_encoder_level(ep, cfg, i, compute_dtype, budget)
           for i, ep in enumerate(params["encoder"])]
    dec = [pack_decoder_level(dp, cfg, D - 1 - j, compute_dtype, budget)
           for j, dp in enumerate(params["decoder"])]
    arrays = {"enc": [p[0] if p else None for p in enc],
              "dec": [p[0] if p else None for p in dec]}
    meta = {"enc": [p[1] if p else None for p in enc],
            "dec": [p[1] if p else None for p in dec]}
    if all(m is None for m in meta["enc"] + meta["dec"]):
        return None, None
    return arrays, meta


def encoder_windows(x, K: int, S: int):
    """(B, L, C) -> (B, T, K*C) strided conv windows, K == 2*S geometry —
    the exact layout ``conv1d_strided_matmul`` contracts against
    (ops/conv.py:43-64): window t = input samples [S*t, S*t+K) flattened
    sample-major then channel."""
    B, L, C = x.shape
    T = (L - K) // S + 1
    xg = x[:, : (T + 1) * S, :].reshape(B, T + 1, S * C)
    return jnp.concatenate([xg[:, :-1, :], xg[:, 1:, :]], axis=-1)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _deq(ref, scale_ref, compute_dtype):
    v = ref[...]
    if scale_ref is None:
        return v
    return (v.astype(jnp.float32) * scale_ref[...]).astype(compute_dtype)


def _dot(a, b, compute_dtype):
    """MXU dot; fp32 packs get full-precision passes (matching the fp32
    contract the XLA path only gets under default_matmul_precision), bf16
    packs the native single pass."""
    prec = "highest" if compute_dtype == jnp.float32 else None
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _glu(x, refs, act, mix_q, compute_dtype):
    """x @ [mwa|mwb] + [mba|mbb] -> value * act(gate), no lane slicing."""
    it = iter(refs)
    mwa_ref = next(it)
    mwas_ref = next(it) if mix_q else None
    mwb_ref = next(it)
    mwbs_ref = next(it) if mix_q else None
    mba_ref = next(it)
    mbb_ref = next(it)
    mwa = _deq(mwa_ref, mwas_ref, compute_dtype)
    mwb = _deq(mwb_ref, mwbs_ref, compute_dtype)
    a = _dot(x, mwa, compute_dtype) + mba_ref[...]
    b = _dot(x, mwb, compute_dtype) + mbb_ref[...]
    return a * _ACTS[act](b)


def _glu_args(arrays):
    args = [arrays["mwa"]]
    if "mwa_scale" in arrays:
        args.append(arrays["mwa_scale"])
    args.append(arrays["mwb"])
    if "mwb_scale" in arrays:
        args.append(arrays["mwb_scale"])
    args.extend([arrays["mba"], arrays["mbb"]])
    return args


def _enc_kernel(*refs, act, mix_q, conv_q, compute_dtype):
    it = iter(refs)
    win_ref = next(it)
    cw_ref = next(it)
    cws_ref = next(it) if conv_q else None
    cb_ref = next(it)
    glu_refs = [next(it) for _ in range(6 if mix_q else 4)]
    out_ref = next(it)

    win = win_ref[...].astype(compute_dtype)
    cw = _deq(cw_ref, cws_ref, compute_dtype)
    h = _dot(win, cw, compute_dtype) + cb_ref[...]
    h = jax.nn.relu(h).astype(compute_dtype)
    y = _glu(h, glu_refs, act, mix_q, compute_dtype)
    out_ref[...] = y.astype(out_ref.dtype)


def fused_encoder_level(win, arrays, meta, compute_dtype=jnp.bfloat16,
                        interpret: bool = False):
    """win: (B, T, K*Cin) gathered conv windows -> (B, T, C2/2) level output.

    One kernel for: window GEMM + bias + ReLU + 1x1 mix + bias + GLU.
    """
    B, T, KC = win.shape
    conv_q = "cw_scale" in arrays
    mix_q = "mwa_scale" in arrays
    C2 = meta["C2"]

    args = [win.reshape(B * T, KC), arrays["cw"]]
    if conv_q:
        args.append(arrays["cw_scale"])
    args.append(arrays["cb"])
    args.extend(_glu_args(arrays))

    kernel = functools.partial(
        _enc_kernel, act=meta["act"],
        mix_q=mix_q, conv_q=conv_q, compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * T, C2 // 2), compute_dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, T, C2 // 2)


def _dec_kernel(*refs, B, T, act, relu, has_prev, mix_q, conv_q,
                compute_dtype):
    it = iter(refs)
    x_ref = next(it)
    skip_ref = next(it)
    prev_ref = next(it) if has_prev else None
    glu_refs = [next(it) for _ in range(6 if mix_q else 4)]
    cwlo_ref = next(it)
    cwlos_ref = next(it) if conv_q else None
    cwhi_ref = next(it)
    cwhis_ref = next(it) if conv_q else None
    cb_ref = next(it)
    out_ref = next(it)
    tail_ref = next(it)

    x = x_ref[...].astype(jnp.float32) + skip_ref[...].astype(jnp.float32)
    x = x.astype(compute_dtype)
    g = _glu(x, glu_refs, act, mix_q, compute_dtype).astype(compute_dtype)
    cwlo = _deq(cwlo_ref, cwlos_ref, compute_dtype)
    cwhi = _deq(cwhi_ref, cwhis_ref, compute_dtype)
    SC = cwlo.shape[-1]
    lo = _dot(g, cwlo, compute_dtype).reshape(B, T, SC)
    hi = _dot(g, cwhi, compute_dtype).reshape(B, T, SC)
    cb = cb_ref[...]  # (1, S*Cout)

    first = lo[:, 0:1, :] + cb
    if has_prev:
        first = first + prev_ref[...].astype(jnp.float32)
    if relu:
        first = jax.nn.relu(first)
    out_ref[:, 0:1, :] = first.astype(out_ref.dtype)
    if T > 1:
        rest = lo[:, 1:, :] + hi[:, : T - 1, :] + cb
        if relu:
            rest = jax.nn.relu(rest)
        out_ref[:, 1:, :] = rest.astype(out_ref.dtype)
    tail_ref[...] = hi[:, T - 1: T, :].astype(tail_ref.dtype)


def fused_decoder_level(x, skip, prev_grouped, arrays, meta,
                        relu: bool, compute_dtype=jnp.bfloat16,
                        interpret: bool = False):
    """One decoder level on T streaming tokens, grouped output layout.

    x, skip: (B, T, C); prev_grouped: (B, 1, S*Cout) overlap tail (stored
    without convT bias, exactly as the XLA path caches it) or None on the
    priming frame.  Returns (out_grouped (B, T, S*Cout), tail_grouped
    (B, 1, S*Cout)); ``out_grouped.reshape(B, T*S, Cout)`` is the level
    output after overlap-add (+ReLU), ``tail`` is next frame's carry.
    """
    B, T, C = x.shape
    S, Cout = meta["S"], meta["Cout"]
    mix_q = "mwa_scale" in arrays
    conv_q = "cwlo_scale" in arrays
    has_prev = prev_grouped is not None

    args = [x.reshape(B * T, C), skip.reshape(B * T, C)]
    if has_prev:
        args.append(prev_grouped)
    args.extend(_glu_args(arrays))
    args.append(arrays["cwlo"])
    if conv_q:
        args.append(arrays["cwlo_scale"])
    args.append(arrays["cwhi"])
    if conv_q:
        args.append(arrays["cwhi_scale"])
    args.append(arrays["cb_tiled"])

    kernel = functools.partial(
        _dec_kernel, B=B, T=T, act=meta["act"], relu=relu,
        has_prev=has_prev, mix_q=mix_q, conv_q=conv_q,
        compute_dtype=compute_dtype,
    )
    out, tail = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, S * Cout), compute_dtype),
            jax.ShapeDtypeStruct((B, 1, S * Cout), compute_dtype),
        ),
        interpret=interpret,
    )(*args)
    return out, tail
