"""Full-model golden test vs an independent torch-CPU assembly.

mamba_ssm is not installable here, so the reference model itself cannot run;
instead this builds the same architecture out of plain torch modules (exactly
as reference CleanUMamba.py:104-139 does for the U-Net) plus a from-the-
equations torch Mamba mixer, loads the *released checkpoint weights* into
both, and compares outputs end-to-end.  This exercises every layout
conversion in convert.py and the whole forward assembly (skip ordering,
padding, normalisation, residual/norm semantics) against a foreign
implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F


class TorchMambaMixer(nn.Module):
    """mamba-ssm Mamba forward math (slow path), from the selective-SSM
    equations (see models/bottleneck_mamba.py docstring)."""

    def __init__(self, d_model, d_inner, d_state, dt_rank, d_conv=4):
        super().__init__()
        self.in_proj = nn.Linear(d_model, 2 * d_inner, bias=False)
        self.conv1d = nn.Conv1d(d_inner, d_inner, d_conv, groups=d_inner, padding=d_conv - 1)
        self.x_proj = nn.Linear(d_inner, dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(dt_rank, d_inner, bias=True)
        self.A_log = nn.Parameter(torch.zeros(d_inner, d_state))
        self.D = nn.Parameter(torch.zeros(d_inner))
        self.out_proj = nn.Linear(d_inner, d_model, bias=False)
        self.d_state, self.dt_rank, self.d_inner = d_state, dt_rank, d_inner

    def forward(self, x):  # (B, T, d_model)
        B_, T, _ = x.shape
        xz = self.in_proj(x)
        xs, z = xz.split(self.d_inner, dim=-1)
        xs = self.conv1d(xs.transpose(1, 2))[..., :T].transpose(1, 2)
        xs = F.silu(xs)
        dbc = self.x_proj(xs)
        dt, Bm, C = torch.split(dbc, [self.dt_rank, self.d_state, self.d_state], dim=-1)
        dt = F.softplus(self.dt_proj(dt))
        A = -torch.exp(self.A_log)
        h = torch.zeros(B_, self.d_inner, self.d_state)
        ys = []
        for t in range(T):
            a = torch.exp(dt[:, t, :, None] * A)
            h = a * h + (dt[:, t] * xs[:, t])[:, :, None] * Bm[:, t, None, :]
            ys.append(torch.einsum("bis,bs->bi", h, C[:, t]) + self.D * xs[:, t])
        y = torch.stack(ys, dim=1)
        y = y * F.silu(z)
        return self.out_proj(y)


def build_torch_model(sd, cfg):
    """Assemble encoder/decoder/bottleneck exactly like reference
    CleanUMamba.__init__ (:104-194) and load the checkpoint weights.

    All widths come from the state-dict shapes, so ragged channel-pruned
    checkpoints assemble correctly (like reference load_pruned_state_dict)."""
    D, K, S = cfg.encoder_n_layers, cfg.kernel_size, cfg.stride
    encoder, decoder = nn.ModuleList(), nn.ModuleList()
    for i in range(D):
        cw = sd[f"encoder.{i}.0.weight"]
        mw = sd[f"encoder.{i}.2.weight"]
        encoder.append(nn.Sequential(
            nn.Conv1d(cw.shape[1], cw.shape[0], K, S), nn.ReLU(),
            nn.Conv1d(mw.shape[1], mw.shape[0], 1), nn.GLU(dim=1)
        ))
        dmw = sd[f"decoder.{i}.0.weight"]
        dtw = sd[f"decoder.{i}.2.weight"]  # ConvTranspose (Cin, Cout, K)
        dec = nn.Sequential(nn.Conv1d(dmw.shape[1], dmw.shape[0], 1), nn.GLU(dim=1),
                            nn.ConvTranspose1d(dtw.shape[0], dtw.shape[1], K, S))
        if i != D - 1:  # ReLU on all but the final output layer
            dec.append(nn.ReLU())
        decoder.append(dec)

    c1 = sd["tsfm_conv1.weight"]
    c2 = sd["tsfm_conv2.weight"]
    tsfm_conv1 = nn.Conv1d(c1.shape[1], c1.shape[0], 1)
    tsfm_conv2 = nn.Conv1d(c2.shape[1], c2.shape[0], 1)
    mixers = nn.ModuleList()
    norms = nn.ModuleList()
    for l in range(cfg.tsfm_n_layers):
        p = f"tsfm_Mamba_layers.{l}.mixer"
        dt_rank = sd[f"{p}.dt_proj.weight"].shape[1]
        d_state = (sd[f"{p}.x_proj.weight"].shape[0] - dt_rank) // 2
        d_inner = sd[f"{p}.x_proj.weight"].shape[1]
        d_model = sd[f"{p}.in_proj.weight"].shape[1]
        mixers.append(TorchMambaMixer(d_model, d_inner, d_state, dt_rank))
        norms.append(nn.LayerNorm(sd[f"tsfm_Mamba_layers.{l}.norm.weight"].shape[0]))
    norm_f = nn.LayerNorm(sd["norm_f.weight"].shape[0])

    # load weights
    with torch.no_grad():
        for i in range(D):
            encoder[i][0].weight.copy_(sd[f"encoder.{i}.0.weight"].float())
            encoder[i][0].bias.copy_(sd[f"encoder.{i}.0.bias"].float())
            encoder[i][2].weight.copy_(sd[f"encoder.{i}.2.weight"].float())
            encoder[i][2].bias.copy_(sd[f"encoder.{i}.2.bias"].float())
            decoder[i][0].weight.copy_(sd[f"decoder.{i}.0.weight"].float())
            decoder[i][0].bias.copy_(sd[f"decoder.{i}.0.bias"].float())
            decoder[i][2].weight.copy_(sd[f"decoder.{i}.2.weight"].float())
            decoder[i][2].bias.copy_(sd[f"decoder.{i}.2.bias"].float())
        tsfm_conv1.weight.copy_(sd["tsfm_conv1.weight"].float())
        tsfm_conv1.bias.copy_(sd["tsfm_conv1.bias"].float())
        tsfm_conv2.weight.copy_(sd["tsfm_conv2.weight"].float())
        tsfm_conv2.bias.copy_(sd["tsfm_conv2.bias"].float())
        norm_f.weight.copy_(sd["norm_f.weight"].float())
        norm_f.bias.copy_(sd["norm_f.bias"].float())
        for l in range(cfg.tsfm_n_layers):
            p = f"tsfm_Mamba_layers.{l}"
            norms[l].weight.copy_(sd[f"{p}.norm.weight"].float())
            norms[l].bias.copy_(sd[f"{p}.norm.bias"].float())
            m = mixers[l]
            m.in_proj.weight.copy_(sd[f"{p}.mixer.in_proj.weight"].float())
            m.conv1d.weight.copy_(sd[f"{p}.mixer.conv1d.weight"].float())
            m.conv1d.bias.copy_(sd[f"{p}.mixer.conv1d.bias"].float())
            m.x_proj.weight.copy_(sd[f"{p}.mixer.x_proj.weight"].float())
            m.dt_proj.weight.copy_(sd[f"{p}.mixer.dt_proj.weight"].float())
            m.dt_proj.bias.copy_(sd[f"{p}.mixer.dt_proj.bias"].float())
            m.A_log.copy_(sd[f"{p}.mixer.A_log"].float())
            m.D.copy_(sd[f"{p}.mixer.D"].float())
            m.out_proj.weight.copy_(sd[f"{p}.mixer.out_proj.weight"].float())

    def run(x):  # x: (B, L) torch
        with torch.no_grad():
            std = x.unsqueeze(1).std(dim=2, keepdim=True) + 1e-3
            xn = x.unsqueeze(1) / std
            L = xn.shape[-1]
            Lv = cfg.valid_length(L)
            xp = F.pad(xn, (0, Lv - L))
            skips = []
            for enc in encoder:
                xp = enc(xp)
                skips.append(xp)
            skips = skips[::-1]
            xp = tsfm_conv1(xp)
            hidden = xp.permute(0, 2, 1)
            residual = None
            for norm, mixer in zip(norms, mixers):
                residual = hidden + residual if residual is not None else hidden
                hidden = norm(residual)
                hidden = mixer(hidden)
            residual = hidden + residual
            hidden = norm_f(residual)
            xp = tsfm_conv2(hidden.permute(0, 2, 1))
            for j, dec in enumerate(decoder):
                xp = xp + skips[j][:, :, : xp.shape[-1]]
                xp = dec(xp)
            return (xp[:, 0, :L] * std[:, 0]).numpy()

    return run


def test_lstm_matches_torch_nn_lstm(rng):
    """Our LSTM bottleneck vs torch.nn.LSTM itself (true oracle for gate
    order/semantics), with the released LSTM checkpoint weights."""
    import os

    if not os.path.isdir("/root/reference/checkpoints"):
        pytest.skip("reference not mounted")
    ck = torch.load(
        "/root/reference/checkpoints/experiments/Experiment_CleanU_LSTM.pkl",
        map_location="cpu", weights_only=False,
    )
    sd = ck["model_state_dict"]
    lstm = nn.LSTM(input_size=64, hidden_size=64, num_layers=3, bidirectional=False)
    with torch.no_grad():
        for l in range(3):
            getattr(lstm, f"weight_ih_l{l}").copy_(sd[f"tsfm_Mamba_layers.weight_ih_l{l}"].float())
            getattr(lstm, f"weight_hh_l{l}").copy_(sd[f"tsfm_Mamba_layers.weight_hh_l{l}"].float())
            getattr(lstm, f"bias_ih_l{l}").copy_(sd[f"tsfm_Mamba_layers.bias_ih_l{l}"].float())
            getattr(lstm, f"bias_hh_l{l}").copy_(sd[f"tsfm_Mamba_layers.bias_hh_l{l}"].float())
    x = rng.normal(size=(2, 50, 64)).astype(np.float32)
    with torch.no_grad():
        # reference applies nn.LSTM in (T, B, H) layout (CleanUMamba.py:279-282)
        y_t = lstm(torch.from_numpy(x.transpose(1, 0, 2)))[0].numpy().transpose(1, 0, 2)
    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.models import bottleneck_lstm

    cfg, params, _ = load_reference_checkpoint(
        "/root/reference/checkpoints/experiments/Experiment_CleanU_LSTM.pkl"
    )
    y_j = np.asarray(bottleneck_lstm.forward(params["bottleneck"]["layers"], jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


@requires_reference
@pytest.mark.parametrize(
    "rel",
    [
        "experiments/Experiment_CleanU_Mamba.pkl",
        "pruned/CleanUMamba-3N-E8_pruned-200K.pkl",  # ragged per-layer widths
    ],
)
def test_full_model_matches_independent_torch_assembly(rel):
    path = f"/root/reference/checkpoints/{rel}"
    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck["model_state_dict"]
    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.models.cleanumamba import forward

    cfg, params, _ = load_reference_checkpoint(path)
    run_torch = build_torch_model(sd, cfg)

    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 8000)) * 0.2).astype(np.float32)
    y_torch = run_torch(torch.from_numpy(x))
    y_jax = np.asarray(forward(params, jnp.asarray(x), cfg, scan_impl="xla"))
    err = np.abs(y_torch - y_jax).max()
    scale = np.abs(y_torch).max()
    assert err < 2e-4 * max(scale, 1.0), (err, scale)
