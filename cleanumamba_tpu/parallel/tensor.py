"""Tensor (model) parallelism for CleanUMamba over a named mesh axis.

Beyond the reference (which distributes with DDP only,
/root/reference/src/training/train_distributed.py): Megatron-style
intra-layer sharding, laid out so every U-Net level costs exactly ONE
``psum`` and every mamba block exactly TWO, all riding ICI:

- **Encoder level** (strided conv -> ReLU -> 1x1 -> GLU): the strided conv
  is column-parallel over its ``H`` output channels (each device holds a
  ``(K, Cin, H/n)`` weight slab and produces its own channel slice), the
  1x1 mix is row-parallel over the same ``H`` (partial products ->
  ``psum``), and the GLU runs replicated.  One psum of the ``(B, T, mix_out)``
  activation per level; ``T`` halves per level so the collective traffic is
  geometric.
- **Mamba mixer**: ``in_proj`` column-parallel over ``2*d_inner`` (the x|z
  halves are block-interleaved at prepare time so each device's contiguous
  slice is ``[x_k | z_k]`` and the unmodified split/gate code is correct
  locally), depthwise conv + SiLU + selective scan are elementwise in
  ``d_inner`` and run fully local (the fp32 state shards with ``d_inner``),
  ``x_proj`` is row-parallel (psum of the tiny ``dt_rank+2*d_state``
  projection), ``dt_proj`` column-parallel, ``out_proj`` row-parallel
  (psum of ``(B, T, d_model)``).  Norms and the fp32 residual stream stay
  replicated.
- **Decoder level** (1x1 -> GLU -> ConvT): the 1x1 mix is column-parallel
  with its ``[bypass | A | B]`` GLU column structure block-interleaved so
  the GLU gates locally, and the transposed conv is row-parallel over its
  input channels -> one psum of the upsampled ``(B, 2T, Cout)`` output.

- **MHA bottleneck** (the "CleanUNet" variant): the original Megatron
  construction — Q/K/V column-parallel over whole heads, the attention
  output projection and FFN down-projection row-parallel (two psums per
  layer).
- **MambaS4 mixer**: ``d_inner`` shards exactly like mamba (x|z
  interleave), ``input_linear`` row-parallel into the tiny replicated-H S4
  long convolution, ``output_linear`` column-parallel with its GLU [A|B]
  halves interleaved, ``out_proj`` row-parallel.
- **LSTM**: waived on principle — the dense recurrence consumes the FULL
  hidden state every timestep, so any hidden-dim sharding costs one
  collective per timestep (625/forward at 10 s); LSTM models train DP.

Weights are genuinely sharded (``PartitionSpec`` on the parallel dim of
each leaf — per-device parameter memory is ~1/n for the big matrices);
activations entering/leaving each level are replicated on the model axis,
which is the standard Megatron trade.  Composition with data parallelism
is a 2-D mesh: batch sharded on ``data``, weights sharded on ``model``
(see :func:`tp_forward`'s ``data_axis``).

Implemented with ``shard_map`` (like the DP trainer) because GSPMD cannot
partition ``pallas_call`` and we want the collectives placed exactly.

Divisibility contract (checked in :func:`tp_prepare`): every encoder
``H``, GLU pair width and bypass width, and the bottleneck ``d_inner``
must divide the model-axis size.  The full-size released geometries
(H = 32/48/64 doublings, d_inner = 2*d_model) satisfy this for n in
{2, 4, 8}; ragged *pruned* checkpoints generally do not — tensor
parallelism targets the large/training-time models, pruned deployment
models stream on one chip (see docs/performance.md).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.ops.conv import (
    causal_depthwise_conv,
    conv1d_strided_matmul,
    conv_transpose1d,
    glu_activation,
)
from cleanumamba_tpu.ops.norms import layer_norm, rms_norm

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Parameter preparation: block-interleave permutations + PartitionSpecs
# --------------------------------------------------------------------------

def _interleave_perm(sizes: List[int], n: int) -> np.ndarray:
    """Index permutation so that contiguous block k (of n) of the permuted
    axis holds ``[seg0_k | seg1_k | ...]`` where ``segi_k`` is the k-th
    1/n slice of the i-th original contiguous segment."""
    offs = np.cumsum([0] + list(sizes))[:-1]
    idx = []
    for k in range(n):
        for sz, off in zip(sizes, offs):
            m = sz // n
            idx.extend(range(off + k * m, off + (k + 1) * m))
    return np.asarray(idx, np.int64)


def _check_div(name: str, value: int, n: int):
    if value % n != 0:
        raise ValueError(
            f"tensor parallelism: {name}={value} not divisible by mesh axis "
            f"size {n} (TP targets the full-size geometries; ragged pruned "
            f"checkpoints stream single-chip)"
        )


def _mixer2_geometry(mx):
    """(d_inner, d_state, n_heads) of a mamba2 mixer param dict (shapes
    mirror models/bottleneck_mamba2.mixer_geometry)."""
    n_heads = mx["A_log"].shape[0]
    d_inner = mx["out_proj"].shape[0]
    d_state = (mx["conv_w"].shape[1] - d_inner) // 2
    return d_inner, d_state, n_heads


def _mixer2_zxdt_idx(d_inner: int, d_state: int, n_heads: int,
                     n: int) -> np.ndarray:
    """Column gather so contiguous block k of the permuted axis is
    ``[z_k | x_k | dt_k]`` — the shardable columns of the canonical mamba2
    ``in_proj`` layout [z | x | B | C | dt] (B/C are head-shared and split
    into a separate replicated leaf)."""
    m, nhl = d_inner // n, n_heads // n
    dt0 = 2 * d_inner + 2 * d_state
    idx = []
    for k in range(n):
        idx.extend(range(k * m, (k + 1) * m))                       # z_k
        idx.extend(range(d_inner + k * m, d_inner + (k + 1) * m))   # x_k
        idx.extend(range(dt0 + k * nhl, dt0 + (k + 1) * nhl))       # dt_k
    return np.asarray(idx, np.int64)


def _tp_prepare_mixer2(mx, l: int, n: int, axis: str):
    """Megatron-style sharding of the mamba2 (SSD) mixer.

    The per-head scalar decay shards exactly like d_inner: heads (and with
    them dt_bias/A_log/D, the x columns, the scan state, and norm_w) split
    over the model axis.  B/C are shared across ALL heads (ngroups=1 in the
    reference config), so their in_proj columns and conv channels move to
    separate REPLICATED leaves — each device computes the identical B/C
    projection locally (redundant (B, T, 2*d_state) work, far cheaper than
    a collective) and the replicated-leaf gradient psum in
    make_tp_train_step keeps their copies in sync.  Collectives per block:
    one scalar-field psum for the gated RMSNorm statistics + one activation
    psum for the row-parallel out_proj.
    """
    d_inner, d_state, n_heads = _mixer2_geometry(mx)
    _check_div(f"bottleneck[{l}].n_heads", n_heads, n)
    _check_div(f"bottleneck[{l}].d_inner", d_inner, n)
    rep = P()
    mx_p = {
        "in_proj_zxdt": mx["in_proj"][:, _mixer2_zxdt_idx(
            d_inner, d_state, n_heads, n)],
        "in_proj_bc": mx["in_proj"][:, 2 * d_inner: 2 * d_inner + 2 * d_state],
        "conv_w_x": mx["conv_w"][:, :d_inner],
        "conv_b_x": mx["conv_b"][:d_inner],
        "conv_w_bc": mx["conv_w"][:, d_inner:],
        "conv_b_bc": mx["conv_b"][d_inner:],
        "dt_bias": mx["dt_bias"],
        "A_log": mx["A_log"],
        "D": mx["D"],
        "norm_w": mx["norm_w"],
        "out_proj": mx["out_proj"],
    }
    mx_s = {
        "in_proj_zxdt": P(None, axis),
        "in_proj_bc": rep,
        "conv_w_x": P(None, axis),
        "conv_b_x": P(axis),
        "conv_w_bc": rep,
        "conv_b_bc": rep,
        "dt_bias": P(axis),
        "A_log": P(axis),
        "D": P(axis),
        "norm_w": P(axis),
        "out_proj": P(axis, None),
    }
    return mx_p, mx_s


def _tp_unsplit_mixer2(mx_tp, n: int):
    """Inverse of :func:`_tp_prepare_mixer2`: reassemble the canonical
    mamba2 mixer leaves from the TP split/permuted layout."""
    d_inner = mx_tp["out_proj"].shape[0]
    n_heads = mx_tp["A_log"].shape[0]
    d_state = mx_tp["in_proj_bc"].shape[1] // 2
    idx = _mixer2_zxdt_idx(d_inner, d_state, n_heads, n)
    zxdt = mx_tp["in_proj_zxdt"]
    in_proj = jnp.zeros(
        (zxdt.shape[0], 2 * d_inner + 2 * d_state + n_heads), zxdt.dtype)
    in_proj = in_proj.at[:, idx].set(zxdt)
    in_proj = in_proj.at[:, 2 * d_inner: 2 * d_inner + 2 * d_state].set(
        mx_tp["in_proj_bc"])
    return {
        "in_proj": in_proj,
        "conv_w": jnp.concatenate([mx_tp["conv_w_x"], mx_tp["conv_w_bc"]], 1),
        "conv_b": jnp.concatenate([mx_tp["conv_b_x"], mx_tp["conv_b_bc"]]),
        "dt_bias": mx_tp["dt_bias"],
        "A_log": mx_tp["A_log"],
        "D": mx_tp["D"],
        "norm_w": mx_tp["norm_w"],
        "out_proj": mx_tp["out_proj"],
    }


def _tp_prepare_s4_mixer(mx, l: int, n: int, axis: str):
    """Megatron-style sharding of the MambaS4 mixer (bottleneck_s4).

    ``d_inner`` shards: ``in_proj`` column-parallel with the x|z halves
    block-interleaved (exactly like mamba), the depthwise conv is
    channel-local, ``input_linear`` (d_inner -> H) is row-parallel (psum of
    the tiny (B, T, H) projection), the S4 long convolution itself runs
    REPLICATED — its width H = d_state_s4 (16 on the released geometry) is
    far below a useful shard and the kernel construction is O(H*N*L)
    elementwise — and ``output_linear`` (H -> 2*d_inner) is column-parallel
    with its GLU [A | B] halves block-interleaved so the gate is local;
    ``out_proj`` is row-parallel.  Two activation psums per block, same
    count as the mamba mixer.
    """
    d_inner = mx["conv_w"].shape[1]
    _check_div(f"bottleneck[{l}].d_inner", d_inner, n)
    rep = P()
    perm_xz = _interleave_perm([d_inner, d_inner], n)
    perm_ab = _interleave_perm([d_inner, d_inner], n)
    mx_p = dict(mx)
    mx_p["in_proj"] = mx["in_proj"][:, perm_xz]
    mx_p["output_linear_w"] = mx["output_linear_w"][:, perm_ab]
    mx_p["output_linear_b"] = mx["output_linear_b"][perm_ab]
    mx_s = {
        "in_proj": P(None, axis),
        "conv_w": P(None, axis),
        "conv_b": P(axis),
        "input_linear_w": P(axis, None),
        "input_linear_b": rep,  # added once, after the psum
        "kernel": jax.tree_util.tree_map(lambda _: rep, mx["kernel"]),
        "ssm_D": rep,
        "output_linear_w": P(None, axis),
        "output_linear_b": P(axis),
        "out_proj": P(axis, None),
    }
    return mx_p, mx_s


def _tp_prepare_mha(bott, cfg, n: int, axis: str):
    """Megatron-style sharding of the MHA ("CleanUNet") bottleneck — the
    original tensor-parallel construction (Megatron-LM): Q/K/V projections
    column-parallel over heads (the head blocks are contiguous columns, so
    a plain 1/n column slice holds n_head/n whole heads and the unmodified
    attention code is correct locally), the attention output projection
    row-parallel (psum), the FFN up-projection column-parallel and
    down-projection row-parallel (psum).  Norms and residuals replicated.
    Two activation psums per layer.
    """
    rep = P()
    d = bott["layers"][0]["w_qs"].shape[0]
    _check_div("mha.n_head", cfg.tsfm_n_head, n)
    _check_div("mha.d_model", d, n)
    layers_p, layers_s = [], []
    for lp in bott["layers"]:
        _check_div("mha.ffn_d_inner", lp["ffn_b1"].shape[0], n)
        layers_p.append(dict(lp))
        layers_s.append({
            "w_qs": P(None, axis),
            "w_ks": P(None, axis),
            "w_vs": P(None, axis),
            "fc": P(axis, None),
            "attn_norm": {"scale": rep, "bias": rep},
            "ffn_w1": P(None, axis),
            "ffn_b1": P(axis),
            "ffn_w2": P(axis, None),
            "ffn_b2": rep,  # added once, after the psum
            "ffn_norm": {"scale": rep, "bias": rep},
        })
    return (
        {"layers": layers_p, "enc_norm": dict(bott["enc_norm"])},
        {"layers": layers_s, "enc_norm": {"scale": rep, "bias": rep}},
    )


def tp_prepare(params: Params, cfg: CleanUMambaConfig, n: int,
               axis: str = "model") -> Tuple[Params, Any]:
    """Return ``(params_tp, specs)``: the parameter pytree with GLU/x|z
    column structures block-interleaved so a contiguous 1/n slice is locally
    consistent, plus a matching pytree of ``PartitionSpec`` for shard_map.

    Pure host-side reindexing — cheap, done once per (params, n).
    """
    if cfg.bottleneck == "lstm":
        # Principled waiver, not a TODO: the LSTM recurrence h_t needs the
        # FULL h_{t-1} through the dense (h, 4h) recurrent matrix, so
        # sharding the hidden dim costs one collective PER TIMESTEP (625
        # psums per 10 s forward at total_stride 256) — latency-bound, no
        # sensible TP mapping exists (Megatron-style TP covers attention
        # and channel-local SSMs only).  LSTM models train data-parallel.
        raise NotImplementedError(
            "tensor parallelism: the LSTM bottleneck's dense recurrence "
            "requires a per-timestep collective and does not shard; use "
            "data parallelism (see tp_prepare docstring)"
        )
    rep = P()
    out_p: Params = {}
    out_s: Params = {}

    D = len(params["encoder"])
    enc_p, enc_s = [], []
    for i, ep in enumerate(params["encoder"]):
        if cfg.group_of_layer(i) != 1:
            raise NotImplementedError("TP encoder requires groups == 1")
        if cfg.kernel_size != 2 * cfg.stride:
            raise NotImplementedError("TP encoder requires K == 2*S")
        H = ep["conv_w"].shape[2]
        _check_div(f"encoder[{i}].H", H, n)
        enc_p.append(dict(ep))
        enc_s.append({
            "conv_w": P(None, None, axis),   # column-parallel out channels
            "conv_b": P(axis),
            "mix_w": P(None, axis, None),    # row-parallel over H
            "mix_b": rep,                     # added once, after the psum
        })
    out_p["encoder"], out_s["encoder"] = enc_p, enc_s

    if "residual_projection" in params:
        out_p["residual_projection"] = params["residual_projection"]
        out_s["residual_projection"] = jax.tree_util.tree_map(
            lambda _: rep, params["residual_projection"]
        )

    out_p["tsfm_conv1"] = params["tsfm_conv1"]
    out_s["tsfm_conv1"] = {"w": rep, "b": rep}
    out_p["tsfm_conv2"] = params["tsfm_conv2"]
    out_s["tsfm_conv2"] = {"w": rep, "b": rep}

    if cfg.bottleneck == "mha":
        out_p["bottleneck"], out_s["bottleneck"] = _tp_prepare_mha(
            params["bottleneck"], cfg, n, axis)
        return _tp_prepare_decoder(params, cfg, n, axis, out_p, out_s)

    layers_p, layers_s = [], []
    for l, lp in enumerate(params["bottleneck"]["layers"]):
        mx = lp["mixer"]
        if "dt_bias" in mx:  # mamba2 (SSD): per-head scalar decay
            mx_p, mx_s = _tp_prepare_mixer2(mx, l, n, axis)
            layers_p.append({"norm": dict(lp["norm"]), "mixer": mx_p})
            layers_s.append({
                "norm": jax.tree_util.tree_map(lambda _: rep, lp["norm"]),
                "mixer": mx_s,
            })
            continue
        if "input_linear_w" in mx:  # mamba_s4 (S4 inner SSM)
            mx_p, mx_s = _tp_prepare_s4_mixer(mx, l, n, axis)
            layers_p.append({"norm": dict(lp["norm"]), "mixer": mx_p})
            layers_s.append({
                "norm": jax.tree_util.tree_map(lambda _: rep, lp["norm"]),
                "mixer": mx_s,
            })
            continue
        d_inner = mx["dt_proj_w"].shape[1]
        _check_div(f"bottleneck[{l}].d_inner", d_inner, n)
        perm_xz = _interleave_perm([d_inner, d_inner], n)
        mx_p = dict(mx)
        mx_p["in_proj"] = mx["in_proj"][:, perm_xz]
        mx_s = {
            "in_proj": P(None, axis),
            "conv_w": P(None, axis),
            "conv_b": P(axis),
            "x_proj": P(axis, None),
            "dt_proj_w": P(None, axis),
            "dt_proj_b": P(axis),
            "A_log": P(axis, None),
            "D": P(axis),
            "out_proj": P(axis, None),
        }
        layers_p.append({"norm": dict(lp["norm"]), "mixer": mx_p})
        layers_s.append({
            "norm": jax.tree_util.tree_map(lambda _: rep, lp["norm"]),
            "mixer": mx_s,
        })
    out_p["bottleneck"] = {"layers": layers_p,
                           "norm_f": dict(params["bottleneck"]["norm_f"])}
    out_s["bottleneck"] = {
        "layers": layers_s,
        "norm_f": jax.tree_util.tree_map(
            lambda _: rep, params["bottleneck"]["norm_f"]),
    }
    return _tp_prepare_decoder(params, cfg, n, axis, out_p, out_s)


def _tp_prepare_decoder(params, cfg, n, axis, out_p, out_s):
    """Decoder half of :func:`tp_prepare` (shared by every bottleneck
    family): 1x1 mix column-parallel with the [bypass | A | B] GLU column
    structure block-interleaved, ConvT row-parallel."""
    rep = P()
    D = len(params["encoder"])
    dec_p, dec_s = [], []
    for j, dp in enumerate(params["decoder"]):
        enc_i = D - 1 - j
        bp = cfg.bypass_of_layer(enc_i)
        mix_out = dp["mix_w"].shape[2]
        nAB = (mix_out - bp) // 2
        glu_out = bp + nAB  # == convt input channels
        _check_div(f"decoder[{j}].bypass", bp, n)
        _check_div(f"decoder[{j}].glu_pair", nAB, n)
        perm_cols = _interleave_perm([bp, nAB, nAB], n)
        perm_rows = _interleave_perm([bp, nAB], n)
        assert dp["convt_w"].shape[1] == glu_out
        dec_p.append({
            "mix_w": dp["mix_w"][:, :, perm_cols],
            "mix_b": dp["mix_b"][perm_cols],
            "convt_w": dp["convt_w"][:, perm_rows, :],
            "convt_b": dp["convt_b"],
        })
        dec_s.append({
            "mix_w": P(None, None, axis),   # column-parallel (GLU-local)
            "mix_b": P(axis),
            "convt_w": P(None, axis, None),  # row-parallel over input chans
            "convt_b": rep,                   # added once, after the psum
        })
    out_p["decoder"], out_s["decoder"] = dec_p, dec_s
    return out_p, out_s


def tp_permute_like(tree: Params, cfg: CleanUMambaConfig, n: int,
                    inverse: bool = False) -> Params:
    """Apply :func:`tp_prepare`'s column/row block-interleaving (or, with
    ``inverse=True``, undo it) to any pytree with the canonical params
    STRUCTURE — the params themselves, or Adam's mu/nu moments (their leaves
    have the same shapes, so the same permutations apply).  Pure host-side
    reindexing."""
    out = jax.tree_util.tree_map(lambda x: x, tree)  # shallow copy
    for l, lp in enumerate(out["bottleneck"]["layers"]):
        if "mixer" not in lp:  # mha: heads are contiguous — no permutation
            continue
        mx = lp["mixer"]
        if "dt_bias" in mx:  # mamba2: split <-> canonical restructuring
            lp["mixer"] = (_tp_unsplit_mixer2(mx, n) if inverse
                           else _tp_prepare_mixer2(mx, l, n, "model")[0])
            continue
        if "input_linear_w" in mx:  # mamba_s4: x|z and GLU [A|B] interleaves
            d_inner = mx["conv_w"].shape[1]
            perm = _interleave_perm([d_inner, d_inner], n)
            if inverse:
                perm = np.argsort(perm)
            mx["in_proj"] = mx["in_proj"][:, perm]
            mx["output_linear_w"] = mx["output_linear_w"][:, perm]
            mx["output_linear_b"] = mx["output_linear_b"][perm]
            continue
        d_inner = mx["dt_proj_w"].shape[1]
        perm = _interleave_perm([d_inner, d_inner], n)
        if inverse:
            perm = np.argsort(perm)
        mx["in_proj"] = mx["in_proj"][:, perm]
    D = len(out["encoder"])
    for j, dp in enumerate(out["decoder"]):
        enc_i = D - 1 - j
        bp = cfg.bypass_of_layer(enc_i)
        mix_out = dp["mix_w"].shape[2]
        nAB = (mix_out - bp) // 2
        perm_c = _interleave_perm([bp, nAB, nAB], n)
        perm_r = _interleave_perm([bp, nAB], n)
        if inverse:
            perm_c, perm_r = np.argsort(perm_c), np.argsort(perm_r)
        dp["mix_w"] = dp["mix_w"][:, :, perm_c]
        dp["mix_b"] = dp["mix_b"][perm_c]
        dp["convt_w"] = dp["convt_w"][:, perm_r, :]
    return out


def tp_unprepare(params_tp: Params, cfg: CleanUMambaConfig, n: int) -> Params:
    """Inverse of :func:`tp_prepare`'s column/row block-interleaving: turn a
    (gathered) TP parameter pytree back into the canonical layout — e.g. to
    bank a checkpoint after tensor-parallel training."""
    return tp_permute_like(params_tp, cfg, n, inverse=True)


def tp_opt_state_like(opt_state, params_template: Params,
                      cfg: CleanUMambaConfig, n: int,
                      inverse: bool = False):
    """Permute (or un-permute) every params-structured subtree of an optax
    state (adam mu/nu) with :func:`tp_permute_like`, so TP training
    checkpoints bank canonical-layout moments and resume re-permutes them.
    Scalars (step counts) pass through unchanged.

    ``params_template`` must match the structure of the state's mu/nu
    subtrees as they are NOW: canonical params for the forward direction,
    TP-layout params for ``inverse=True``.  (For mamba the two structures
    coincide — the TP layout is a pure permutation — but mamba2's TP layout
    splits mixer leaves into different keys.)"""
    pdef = jax.tree_util.tree_structure(params_template)

    def is_param_like(x):
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda x: tp_permute_like(x, cfg, n, inverse) if is_param_like(x) else x,
        opt_state, is_leaf=is_param_like,
    )


# --------------------------------------------------------------------------
# Local (per-device) forward with explicit collectives
# --------------------------------------------------------------------------

def _tp_encoder_level(p, x, cfg, i, axis):
    x = conv1d_strided_matmul(x, p["conv_w"], p["conv_b"], stride=cfg.stride)
    x = jax.nn.relu(x)
    part = x @ p["mix_w"][0].astype(x.dtype)
    full = lax.psum(part, axis) + p["mix_b"].astype(x.dtype)
    return glu_activation(full, cfg.glu_activation, cfg.bypass_of_layer(i))


def _tp_decoder_level(p, x, cfg, enc_i, relu, axis, n):
    part = x @ p["mix_w"][0].astype(x.dtype) + p["mix_b"].astype(x.dtype)
    # local GLU: bypass/A/B were block-interleaved, so the local slice is
    # [bypass_k | A_k | B_k] and the per-device bypass width is bp/n
    x = glu_activation(part, cfg.glu_activation,
                       cfg.bypass_of_layer(enc_i) // n)
    y = conv_transpose1d(x, p["convt_w"], None, stride=cfg.stride)
    y = lax.psum(y, axis) + p["convt_b"].astype(y.dtype)
    return jax.nn.relu(y) if relu else y


def _tp_mixer_forward(p, x, axis, chunk, scan_impl):
    """Local-shard mamba mixer (mirrors bottleneck_mamba.mixer_forward with
    the two TP psums).  d_inner here is the LOCAL d_inner/n."""
    dt_rank, m = p["dt_proj_w"].shape
    d_state = (p["x_proj"].shape[1] - dt_rank) // 2
    xz = x @ p["in_proj"].astype(x.dtype)   # (B, T, 2m) = [x_k | z_k]
    xs, z = xz[..., :m], xz[..., m:]
    xs = causal_depthwise_conv(xs, p["conv_w"], p["conv_b"])
    xs = jax.nn.silu(xs)
    dbc = lax.psum(xs @ p["x_proj"].astype(xs.dtype), axis)  # row-parallel
    dt = dbc[..., :dt_rank] @ p["dt_proj_w"].astype(dbc.dtype) \
        + p["dt_proj_b"].astype(dbc.dtype)
    dt = jax.nn.softplus(dt.astype(jnp.float32))
    B = dbc[..., dt_rank: dt_rank + d_state]
    C = dbc[..., dt_rank + d_state:]
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    h0 = jnp.zeros((xs.shape[0], m, d_state), jnp.float32)
    if scan_impl in ("pallas", "pallas_interpret"):
        from cleanumamba_tpu.ops.pallas.selective_scan import selective_scan_auto
        y, _ = selective_scan_auto(xs, dt, A, B, C, p["D"], h0, chunk,
                                   scan_impl == "pallas_interpret")
    else:
        from cleanumamba_tpu.ops.scan import selective_scan_grad
        y, _ = selective_scan_grad(xs, dt, A, B, C, p["D"], h0, chunk)
    y = y * jax.nn.silu(z)
    return lax.psum(y @ p["out_proj"].astype(y.dtype), axis)  # row-parallel


def _tp_mixer2_forward(p, x, axis, n, chunk):
    """Local-shard mamba2 (SSD) mixer (mirrors bottleneck_mamba2.
    mixer_forward).  Local width m = d_inner/n, local heads = n_heads/n;
    B/C are computed redundantly from the replicated leaves.  Two
    collectives: a scalar-field psum for the gated-RMSNorm mean-square
    (norm statistics span the FULL d_inner) and the row-parallel out_proj
    psum."""
    from cleanumamba_tpu.ops.scan import ssd_scan_grad

    m = p["out_proj"].shape[0]
    nhl = p["A_log"].shape[0]
    headdim = m // nhl
    ds = p["in_proj_bc"].shape[1] // 2
    zxdt = x @ p["in_proj_zxdt"].astype(x.dtype)
    z, xs, dt_h = zxdt[..., :m], zxdt[..., m: 2 * m], zxdt[..., 2 * m:]
    xs = jax.nn.silu(causal_depthwise_conv(xs, p["conv_w_x"], p["conv_b_x"]))
    bc = x @ p["in_proj_bc"].astype(x.dtype)
    bc = jax.nn.silu(causal_depthwise_conv(bc, p["conv_w_bc"], p["conv_b_bc"]))
    B, C = bc[..., :ds], bc[..., ds:]
    dt_h = jax.nn.softplus(dt_h.astype(jnp.float32)
                           + p["dt_bias"].astype(jnp.float32))
    A_head = -jnp.exp(p["A_log"].astype(jnp.float32))
    Bsz, T, _ = xs.shape
    xh = xs.reshape(Bsz, T, nhl, headdim)
    y, _ = ssd_scan_grad(xh, dt_h, A_head, B, C, p["D"], None,
                         min(chunk * 2, 64))
    y = y.reshape(Bsz, T, m)
    # gated RMSNorm over the FULL d_inner (ops.norms.gated_rms_norm with the
    # sum-of-squares all-reduced over the model axis)
    yf = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    ss = jnp.sum(jnp.square(yf), axis=-1, keepdims=True)
    ms = lax.psum(ss, axis) / (m * n)
    yn = yf * jnp.reciprocal(jnp.sqrt(ms + 1e-5)) \
        * p["norm_w"].astype(jnp.float32)
    y = yn.astype(x.dtype)
    return lax.psum(y @ p["out_proj"].astype(y.dtype), axis)


def _tp_s4_mixer_forward(p, x, axis):
    """Local-shard MambaS4 mixer (mirrors bottleneck_s4.mixer_forward /
    _s4block_forward with the two TP psums).  The S4 long convolution runs
    replicated on the full (tiny) H; d_inner is the sharded width."""
    from cleanumamba_tpu.models.bottleneck_s4 import fft_long_conv

    m = p["conv_w"].shape[1]  # LOCAL d_inner/n
    xz = x @ p["in_proj"].astype(x.dtype)   # (B, T, 2m) = [x_k | z_k]
    xs, z = xz[..., :m], xz[..., m:]
    xs = causal_depthwise_conv(xs, p["conv_w"], p["conv_b"])
    xs = jax.nn.silu(xs)
    # input_linear row-parallel: psum of the tiny (B, T, H) projection
    u = lax.psum(xs @ p["input_linear_w"].astype(xs.dtype), axis) \
        + p["input_linear_b"].astype(xs.dtype)
    # S4 FFT long convolution, replicated on the full tiny-H u
    y = fft_long_conv(p, u)
    # output_linear column-parallel, local slice is [A_k | B_k] -> local GLU
    y = y @ p["output_linear_w"].astype(x.dtype) \
        + p["output_linear_b"].astype(x.dtype)
    half = y.shape[-1] // 2
    y = y[..., :half] * jax.nn.sigmoid(y[..., half:])
    y = y * jax.nn.silu(z)
    return lax.psum(y @ p["out_proj"].astype(y.dtype), axis)  # row-parallel


def _tp_mha_forward(params, x, cfg, axis, n):
    """Local-shard MHA bottleneck (mirrors bottleneck_mha.forward with the
    two Megatron psums per layer; Q/K/V hold n_head/n whole heads)."""
    from cleanumamba_tpu.models.bottleneck_mha import _causal_attention

    eps = cfg.norm_epsilon
    heads_local = cfg.tsfm_n_head // n
    x = layer_norm(x, params["enc_norm"]["scale"],
                   params["enc_norm"]["bias"], eps)
    for p in params["layers"]:
        residual = x
        q = x @ p["w_qs"].astype(x.dtype)
        k = x @ p["w_ks"].astype(x.dtype)
        v = x @ p["w_vs"].astype(x.dtype)
        a = _causal_attention(q, k, v, heads_local)
        a = lax.psum(a @ p["fc"].astype(x.dtype), axis)  # row-parallel
        x = layer_norm(a + residual, p["attn_norm"]["scale"],
                       p["attn_norm"]["bias"], eps)
        residual = x
        f = jax.nn.relu(x @ p["ffn_w1"].astype(x.dtype)
                        + p["ffn_b1"].astype(x.dtype))
        f = lax.psum(f @ p["ffn_w2"].astype(x.dtype), axis) \
            + p["ffn_b2"].astype(x.dtype)               # row-parallel
        x = layer_norm(f + residual, p["ffn_norm"]["scale"],
                       p["ffn_norm"]["bias"], eps)
    return x


def _tp_bottleneck(params, x, cfg, axis, chunk, scan_impl, n=1):
    hidden = x
    residual = None
    for lp in params["layers"]:
        residual = (
            hidden.astype(jnp.float32) + residual
            if residual is not None else hidden.astype(jnp.float32)
        )
        if cfg.rms_norm:
            hidden = rms_norm(residual, lp["norm"]["scale"], cfg.norm_epsilon)
        else:
            hidden = layer_norm(residual, lp["norm"]["scale"],
                                lp["norm"]["bias"], cfg.norm_epsilon)
        hidden = hidden.astype(x.dtype)
        if "dt_bias" in lp["mixer"]:
            hidden = _tp_mixer2_forward(lp["mixer"], hidden, axis, n, chunk)
        elif "input_linear_w" in lp["mixer"]:
            hidden = _tp_s4_mixer_forward(lp["mixer"], hidden, axis)
        else:
            hidden = _tp_mixer_forward(lp["mixer"], hidden, axis, chunk,
                                       scan_impl)
    residual = hidden.astype(jnp.float32) + residual
    nf = params["norm_f"]
    if cfg.rms_norm:
        out = rms_norm(residual, nf["scale"], cfg.norm_epsilon)
    else:
        out = layer_norm(residual, nf["scale"], nf["bias"], cfg.norm_epsilon)
    return out.astype(x.dtype)


def _tp_forward_local(params, noisy, cfg, axis, n, chunk, scan_impl):
    """Per-device program; mirrors models.cleanumamba.forward exactly, with
    the TP level/mixer variants (activations replicated on the model axis)."""
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
        x = _tp_encoder_level(ep, x, cfg, i, axis)
        skips.append(x)
    if cfg.residual_projection:
        skips = [
            s @ rp["w"][0].astype(s.dtype) + rp["b"].astype(s.dtype)
            for s, rp in zip(skips, params["residual_projection"])
        ]
    skips = skips[::-1]

    x = x @ params["tsfm_conv1"]["w"][0].astype(x.dtype) \
        + params["tsfm_conv1"]["b"].astype(x.dtype)
    if cfg.bottleneck == "mha":
        x = _tp_mha_forward(params["bottleneck"], x, cfg, axis, n)
    else:
        x = _tp_bottleneck(params["bottleneck"], x, cfg, axis, chunk,
                           scan_impl, n=n)
    x = x @ params["tsfm_conv2"]["w"][0].astype(x.dtype) \
        + params["tsfm_conv2"]["b"].astype(x.dtype)

    n_dec = len(params["decoder"])
    for j, dp in enumerate(params["decoder"]):
        x = x + skips[j][:, : x.shape[1], :]
        x = _tp_decoder_level(dp, x, cfg, n_dec - 1 - j,
                              relu=(j != n_dec - 1), axis=axis, n=n)
    y = x[:, :L, 0]
    if cfg.normalize_input:
        y = y * std[:, 0, :]
    return y


# --------------------------------------------------------------------------
# Public entry points
# --------------------------------------------------------------------------

def tp_forward(params: Params, noisy, cfg: CleanUMambaConfig, mesh: Mesh,
               axis: str = "model", data_axis: str | None = None,
               chunk: int = 32, scan_impl: str = "auto"):
    """Tensor-parallel offline forward over ``mesh[axis]``.

    ``noisy``: (B, L).  With ``data_axis`` set (2-D mesh), the batch is
    additionally sharded over that axis — full DP x TP composition.
    Equals :func:`models.cleanumamba.forward` (tested at fp32 on a CPU
    mesh, tests/test_tensor_parallel.py).
    """
    n = mesh.shape[axis]
    if scan_impl == "auto":
        from cleanumamba_tpu.ops.pallas.selective_scan import pallas_available
        scan_impl = "pallas" if pallas_available() else "xla"
    params_tp, specs = tp_prepare(params, cfg, n, axis)
    x_spec = P(data_axis) if data_axis else P()
    fn = shard_map(
        partial(_tp_forward_local, cfg=cfg, axis=axis, n=n, chunk=chunk,
                scan_impl=scan_impl),
        mesh=mesh, in_specs=(specs, x_spec), out_specs=x_spec,
        check_rep=False,
    )
    return fn(params_tp, noisy)


# --------------------------------------------------------------------------
# Tensor-parallel training
# --------------------------------------------------------------------------

def _is_replicated(spec) -> bool:
    return all(e is None for e in spec)


def _opt_specs_like(opt_state, params_tp, specs):
    """PartitionSpecs for an optax state: any sub-tree that mirrors the
    params structure (adam mu/nu) gets the param specs; scalar counts P()."""
    pdef = jax.tree_util.tree_structure(params_tp)

    def is_param_like(x):
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda x: specs if is_param_like(x) else P(),
        opt_state, is_leaf=is_param_like,
    )


def make_tp_train_step(cfg: CleanUMambaConfig, loss_cfg, opt_cfg, mesh: Mesh,
                       axis: str = "model", data_axis: str | None = None,
                       bf16: bool = True, chunk: int = 32,
                       scan_impl: str = "xla", remat: bool = False):
    """Tensor-parallel (optionally x data-parallel) train step.

    Returns ``(prepare, step)``:

    - ``prepare(params) -> (params_tp, opt_state, specs)`` — permutes +
      sharding-specs the params (:func:`tp_prepare`) and inits the optimizer
      on them (adam moments shard with their parameters, so optimizer memory
      is also ~1/n per device).
    - ``step(params_tp, opt_state, (clean, noisy)) -> (params_tp, opt_state,
      aux)`` — jitted shard_map step.  ``clean/noisy``: (accum, B, L); the
      leading axis is scanned for gradient accumulation exactly like
      make_train_step (reference batch_size_total semantics,
      train.py:232-299), the batch axis sharded over ``data_axis`` when
      given.  ``remat=True`` wraps the local forward in ``jax.checkpoint``
      (TP targets the large geometries where activations do not fit).

    Gradient correctness under TP (tested against the single-device step,
    tests/test_tensor_parallel.py):

    - the differentiated scalar is the LOCAL loss divided by n.  Inside
      shard_map, value_and_grad seeds every device's output cotangent with
      1, so (with psum's self-adjoint transpose) AD computes the gradient
      of the SUM of the per-device outputs.  The local loss is already the
      full loss L on every device (the forward ends in activation psums),
      so sum_k(L/n) = L and every sharded leaf's gradient is exactly its
      true shard.  (Seeding ``psum(loss)/n`` instead — the "obvious"
      Megatron transcription — differentiates sum_k psum(L)/n = n*L and
      inflates every gradient by n; Adam's scale invariance hides that in
      the params but the grad norm and the clip threshold are n* off.);
    - gradients of REPLICATED leaves (norms, tsfm convs, post-psum biases)
      are partial per device (each device only sees the adjoint path through
      its own weight shard) and are psum'd over the model axis;
    - grad-norm clipping uses the true global norm: per-shard square sums
      are psum'd over the model axis before adding the replicated leaves'
      squares (a plain ``optax.global_norm`` on local shards would clip
      device-dependently and de-synchronize the replicated params).
    """
    import dataclasses as _dc

    import optax

    from cleanumamba_tpu.losses import loss_fn as _loss_fn
    from cleanumamba_tpu.train.trainer import make_optimizer

    n = mesh.shape[axis]
    max_norm = float(opt_cfg.clip_grad_norm_max)
    # clipping is done manually (TP-aware norm); the chain must not re-clip
    optimizer = make_optimizer(_dc.replace(opt_cfg, clip_grad_norm_max=1e30))

    def make(params):
        params_tp, specs = tp_prepare(params, cfg, n, axis)
        opt_state = optimizer.init(params_tp)
        opt_specs = _opt_specs_like(opt_state, params_tp, specs)
        is_p = lambda x: isinstance(x, P)  # noqa: E731
        flat_specs = jax.tree_util.tree_leaves(specs, is_leaf=is_p)

        def _over_leaves(fn, grads):
            """Map fn(grad_leaf, spec_leaf) over grads; leaf order matches
            because specs mirrors the params structure exactly."""
            leaves, treedef = jax.tree_util.tree_flatten(grads)
            assert len(leaves) == len(flat_specs)
            return jax.tree_util.tree_unflatten(
                treedef, [fn(g, s) for g, s in zip(leaves, flat_specs)])

        def local_step(p_tp, opt_state, batch):
            clean, noisy = batch  # each (accum, B, L)

            def loss_f(p, c, nz):
                pp = p
                if bf16:
                    pp = jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, p)
                    nz = nz.astype(jnp.bfloat16)
                fwd = lambda q, v: _tp_forward_local(  # noqa: E731
                    q, v, cfg, axis, n, chunk, scan_impl)
                if remat:
                    fwd = jax.checkpoint(fwd)
                y = fwd(pp, nz)
                loss, aux = _loss_fn(y.astype(jnp.float32),
                                     c.astype(jnp.float32), loss_cfg)
                return loss / n, aux

            grad_fn = jax.value_and_grad(loss_f, has_aux=True)

            def micro(acc, xs):
                c, nz = xs
                (_, aux), g = grad_fn(p_tp, c, nz)
                return jax.tree_util.tree_map(jnp.add, acc, g), aux

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), p_tp)
            grads, auxs = lax.scan(micro, zero, (clean, noisy))
            n_micro = clean.shape[0]
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
            aux = jax.tree_util.tree_map(jnp.mean, auxs)
            # replicated leaves: each device holds a PARTIAL grad (only its
            # own shard's adjoint path) -> all-reduce over the model axis
            grads = _over_leaves(
                lambda g, s: lax.psum(g, axis) if _is_replicated(s) else g,
                grads)
            if data_axis is not None:
                grads = lax.pmean(grads, data_axis)
                aux = lax.pmean(aux, data_axis)
            # true global grad norm: shard squares psum over model
            gflat = jax.tree_util.tree_leaves(grads)
            sq_sh = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g, s in zip(gflat, flat_specs)
                        if not _is_replicated(s))
            sq_rep = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g, s in zip(gflat, flat_specs)
                         if _is_replicated(s))
            norm = jnp.sqrt(lax.psum(sq_sh, axis) + sq_rep)
            scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-12), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, new_opt = optimizer.update(grads, opt_state, p_tp)
            new_p = optax.apply_updates(p_tp, updates)
            aux = dict(aux)
            aux["grad_norm"] = norm
            aux["grads_finite"] = jnp.isfinite(norm)
            return new_p, new_opt, aux

        # batch (accum, B, L): accum axis replicated, batch axis data-sharded
        b_spec = P(None, data_axis) if data_axis else P()
        stepped = shard_map(
            local_step, mesh=mesh,
            in_specs=(specs, opt_specs, (b_spec, b_spec)),
            out_specs=(specs, opt_specs, P()),
            check_rep=False,
        )
        step = jax.jit(stepped, donate_argnums=(0, 1))
        return params_tp, opt_state, step

    return make
