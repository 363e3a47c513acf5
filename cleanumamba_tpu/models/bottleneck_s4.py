"""Mamba-S4 bottleneck mixer (reference ``mamba_s4`` flag).

Reimplements, from the S4 math, the reference's vendored stack
(src/network/S4/MambaS4.py + S4_fuctions.py):

    MambaS4 mixer (MambaS4.py:367-473):
      in_proj -> split (x, z) -> causal depthwise conv(K=4) + SiLU
      -> S4Block(d_inner -> 16 "bottleneck"):
           input_linear (d_inner -> H=16)
           FFTConv: DPLR S4 kernel K (C=1, H, L) -> FFT long conv
                    + D skip -> GELU          (MambaS4.py:97-158)
           output_linear (16 -> 2*d_inner) -> GLU
      -> * SiLU(z) -> out_proj

    DPLR kernel (S4_fuctions.py SSMKernelDPLR:1204-1415), bilinear
    discretisation with rank-1 Woodbury correction evaluated through Cauchy
    sums at FFT nodes.  Parameterisation (SSMKernelDiag:1049-1076, defaults
    dt_transform='exp', real_transform='exp', imag_transform='none'):
        dt = exp(inv_dt);  A = -exp(A_real) - i*A_imag  (conjugate half, N=32)
    ``C`` is stored *attuned* ("C~" = C (I - dA^l_kernel)) to the cached
    kernel length ``l_kernel`` (976 in the released checkpoint); computing a
    kernel longer than l_kernel requires the doubling transform
    (S4_fuctions.py:_setup_C:1208-1234), done host-side here.

The reference accelerates the Cauchy reduction with pykeops (survey N5); at
H=16, N=32 a plain einsum materialisation is tiny and XLA-fuses fine.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.ops.conv import causal_depthwise_conv


# ---------------------------------------------------------------------------
# complex helpers (params store complex tensors as (..., 2) real pairs,
# matching torch.view_as_real / the reference's _c2r)
# ---------------------------------------------------------------------------

import dataclasses


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class StaticInt:
    """Static (non-traced) integer metadata carried inside a param pytree —
    used for the attuned kernel length, which controls array shapes."""

    value: int

    def __int__(self):
        return int(self.value)

    def __index__(self):
        return int(self.value)


def _lk(kp) -> int:
    return int(kp["l_kernel"])


def _r2c(x):
    return x[..., 0] + 1j * x[..., 1]


def _c2r(x):
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def _kernel_views(kp):
    """Complex views of the kernel params.

    Returns dt (H,1), A (H,N), B (1,H,N), C~ (C,H,N), P (R,H,N)."""
    dt = jnp.exp(kp["inv_dt"].astype(jnp.float32))
    A = -jnp.exp(kp["A_real"].astype(jnp.float32)) - 1j * kp["A_imag"].astype(jnp.float32)
    B = _r2c(kp["B"].astype(jnp.float32))
    C = _r2c(kp["C"].astype(jnp.float32))
    P = _r2c(kp["P"].astype(jnp.float32))
    return dt, A, B, C, P


def s4_dplr_kernel(kp, L: int):
    """Length-L convolution kernel K (C, H, L) real.

    Parity with SSMKernelDPLR.forward (S4_fuctions.py:1313-1415), rank-1
    Woodbury path, naive Cauchy (conjugate-pair extended)."""
    l_ker = int(kp["l_kernel"])
    assert L <= l_ker, (
        f"kernel length {L} > attuned l_kernel {l_ker}; call "
        "extend_kernel_length() on the params first"
    )
    dt, A, B, C, P = _kernel_views(kp)
    Q = jnp.conj(P)

    n_nodes = l_ker // 2 + 1
    omega = jnp.exp(-2j * jnp.pi / l_ker) ** jnp.arange(n_nodes)
    z = 2.0 * (1.0 - omega) / (1.0 + omega)

    dtA = A * dt  # (H, N)
    Bst = jnp.concatenate([B, P], axis=0)  # (2, H, N)
    Cst = jnp.concatenate([C, Q], axis=0)  # (C+1, H, N)
    v = Bst[:, None] * Cst[None, :]  # (2, C+1, H, N)
    v = v * dt[None, None]  # dt (H,1) broadcasts over N

    # Cauchy sum with conjugate symmetry: r = sum_n v/(z-w) + conj(v)/(z-conj(w))
    def cauchy(v, z, w):
        denom = z[None, None, None, None, :] - w[None, None, :, :, None]
        term = (v[..., None] / denom).sum(axis=-2)
        denom_c = z[None, None, None, None, :] - jnp.conj(w)[None, None, :, :, None]
        term_c = (jnp.conj(v)[..., None] / denom_c).sum(axis=-2)
        return term + term_c  # (2, C+1, H, n_nodes)

    r = cauchy(v, z, dtA)
    k_f = r[:-1, :-1] - r[:-1, -1:] * r[-1:, :-1] / (1.0 + r[-1:, -1:])
    k_f = k_f * 2.0 / (1.0 + omega)
    k = jnp.fft.irfft(k_f, n=l_ker, axis=-1)  # (1, C, H, l_ker) real
    return k[0, :, :, :L]  # (C, H, L)


# ---------------------------------------------------------------------------
# dense discretised system (for streaming + kernel-length doubling)
# ---------------------------------------------------------------------------

def _conj_extend(x, axis=-1):
    return np.concatenate([x, np.conj(x)], axis=axis)


def _dense_discrete(kp):
    """dA (H,2N,2N), dB (H,2N) from the bilinear discretisation of the full
    DPLR matrix A_full = diag(A) - P Q* (rank-1).  Pure jnp (batched complex
    inverse) so it works both eagerly and under jit."""
    dt = jnp.exp(kp["inv_dt"].astype(jnp.float32))  # (H,1)
    A = -jnp.exp(kp["A_real"].astype(jnp.float32)) - 1j * kp["A_imag"].astype(jnp.float32)
    Bc = _jconj_extend(_r2c(kp["B"].astype(jnp.float32)))[0]  # (H, 2N)
    Pc = _jconj_extend(_r2c(kp["P"].astype(jnp.float32)))[0]  # (H, 2N) rank-1
    Ac = _jconj_extend(A)  # (H, 2N)
    H, N2 = Ac.shape
    A_full = (
        jnp.zeros((H, N2, N2), jnp.complex64)
        + Ac[:, :, None] * jnp.eye(N2, dtype=jnp.complex64)[None]
        - Pc[:, :, None] * jnp.conj(Pc)[:, None, :]
    )
    I = jnp.eye(N2, dtype=jnp.complex64)[None]
    dth = dt[:, :1, None].astype(jnp.complex64)  # (H,1,1)
    M = jnp.linalg.inv(I - dth / 2.0 * A_full)
    dA = M @ (I + dth / 2.0 * A_full)
    dB = jnp.einsum("hmn,hn->hm", M, dth[:, 0] * Bc)
    return dA, dB


def _dC_from_Ctilde(kp, dA):
    """Undo the kernel attunement: solve (I - dA^l)^T dC = C~ per (c, h)
    (reference _setup_step, S4_fuctions.py:1526-1539)."""
    l_ker = int(kp["l_kernel"])
    Cc = _jconj_extend(_r2c(kp["C"].astype(jnp.float32)))  # (C, H, 2N)
    if l_ker == 0:
        return Cc
    dA_L = jnp.linalg.matrix_power(dA, l_ker)  # batched over H
    N2 = dA.shape[-1]
    M = jnp.eye(N2, dtype=jnp.complex64)[None] - jnp.swapaxes(dA_L, -1, -2)  # (H,2N,2N)
    # solve per (c, h): (C,H,2N) -> (H,2N,C) rhs
    rhs = jnp.moveaxis(Cc, 0, -1)
    out = jnp.linalg.solve(M, rhs)
    return jnp.moveaxis(out, -1, 0)


def _jconj_extend(x, axis=-1):
    return jnp.concatenate([x, jnp.conj(x)], axis=axis)


def extend_kernel_length(kp: Dict, L: int) -> Dict:
    """Double the attuned kernel length until >= L (host-side transform of
    the C~ parameter; reference _setup_C doubling, S4_fuctions.py:1208-1234).
    Returns new kernel params dict."""
    kp = dict(kp)
    l_ker = int(kp["l_kernel"])
    if 0 < l_ker and L <= l_ker:
        return kp
    dA = np.asarray(_dense_discrete(kp)[0], np.complex128)
    C = np.asarray(kp["C"], np.float64)
    Cc = _conj_extend(C[..., 0] + 1j * C[..., 1])  # (C, H, 2N)
    N = C.shape[-2]
    if l_ker == 0:
        # first attunement: C~ = C (I - dA^L)  (reference _setup_C init path)
        for h in range(dA.shape[0]):
            dA_L = np.linalg.matrix_power(dA[h], L)
            for c in range(Cc.shape[0]):
                Cc[c, h] = Cc[c, h] - dA_L.T @ Cc[c, h]
        kp["C"] = _c2r(Cc[..., :N].astype(np.complex64))
        kp["l_kernel"] = StaticInt(L)
        return kp
    while L > l_ker:
        for h in range(dA.shape[0]):
            dA_L = np.linalg.matrix_power(dA[h], l_ker)
            for c in range(Cc.shape[0]):
                # C~' = C~ (I + dA^l):  prod = (dA^l)^T C~;  C~' = C~ + prod
                Cc[c, h] = Cc[c, h] + dA_L.T @ Cc[c, h]
        l_ker *= 2
    kp["C"] = _c2r(Cc[..., :N].astype(np.complex64))
    kp["l_kernel"] = StaticInt(l_ker)
    return kp


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _s4block_forward(p, x):
    """S4Block around FFTConv.  x: (B, L, d_inner) -> (B, L, d_inner)."""
    u = x @ p["input_linear_w"].astype(x.dtype) + p["input_linear_b"].astype(x.dtype)
    # FFT long convolution (MambaS4.py:127-136): pad to 2L, causal
    B_, L, H = u.shape
    k = s4_dplr_kernel(p["kernel"], L)  # (C=1, H, L)
    n = 2 * L
    uf = jnp.fft.rfft(u.astype(jnp.float32), n=n, axis=1)  # (B, F, H)
    kf = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-1)  # (C, H, F)
    yf = uf[:, None] * jnp.moveaxis(kf, -1, 1)[None]  # (B, C, F, H)
    y = jnp.fft.irfft(yf, n=n, axis=2)[:, :, :L, :]  # (B, C, L, H)
    # D skip (MambaS4.py:136): y[b,c,l,h] += u[b,l,h] * D[c,h]
    y = y + u.astype(jnp.float32)[:, None] * p["ssm_D"].astype(jnp.float32)[None, :, None, :]
    # flatten channels (c h) with C=1 -> (B, L, H)
    y = y[:, 0].astype(x.dtype)
    y = jax.nn.gelu(y, approximate=False)
    # output_linear + GLU over last dim
    y = y @ p["output_linear_w"].astype(x.dtype) + p["output_linear_b"].astype(x.dtype)
    half = y.shape[-1] // 2
    return y[..., :half] * jax.nn.sigmoid(y[..., half:])


def mixer_forward(p, x, chunk: int = 32):
    """x: (B, T, d_model) -> (B, T, d_model) (MambaS4.forward :424-473)."""
    d_inner = p["conv_w"].shape[1]
    xz = x @ p["in_proj"].astype(x.dtype)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]
    xs = causal_depthwise_conv(xs, p["conv_w"], p["conv_b"])
    xs = jax.nn.silu(xs)
    y = _s4block_forward(p, xs)
    y = y * jax.nn.silu(z)
    return y @ p["out_proj"].astype(y.dtype)


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def _jc2r(x):
    """complex -> (..., 2) real pair (complex leaves cannot cross the jit
    boundary on the axon TPU relay; all cached complex data rides as pairs)."""
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)


def mixer_init_cache(p, batch_size: int, dtype=jnp.float32):
    d_inner = p["conv_w"].shape[1]
    d_conv = p["conv_w"].shape[0]
    dA, dB = _dense_discrete(p["kernel"])
    dC = _dC_from_Ctilde(p["kernel"], dA)
    H, N2 = dB.shape
    return {
        "conv_state": jnp.zeros((batch_size, d_conv, d_inner), dtype),
        "s4_state": jnp.zeros((batch_size, H, N2, 2), jnp.float32),
        # discretised system matrices ride in the cache (derived, not params)
        "dA": _jc2r(dA),
        "dB": _jc2r(dB),
        "dC": _jc2r(dC),
    }


def mixer_step(p, cache, x):
    """Single-token step.  x: (B, d_model)."""
    d_inner = p["conv_w"].shape[1]
    xz = x @ p["in_proj"].astype(x.dtype)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]
    conv_state = jnp.concatenate([cache["conv_state"][:, 1:], xs[:, None, :]], axis=1)
    xs = jnp.sum(conv_state * p["conv_w"].astype(x.dtype), axis=1) + p["conv_b"].astype(x.dtype)
    xs = jax.nn.silu(xs)
    u = xs @ p["input_linear_w"].astype(xs.dtype) + p["input_linear_b"].astype(xs.dtype)  # (B, H)
    s = _r2c(cache["s4_state"])
    dA, dB, dC = _r2c(cache["dA"]), _r2c(cache["dB"]), _r2c(cache["dC"])
    s = jnp.einsum("hmn,bhn->bhm", dA, s) + dB[None] * u[..., None].astype(jnp.complex64)
    y = jnp.einsum("chn,bhn->bch", dC, s).real  # (B, C=1, H)
    y = y + u[:, None] * p["ssm_D"].astype(jnp.float32)[None]
    y = y[:, 0].astype(x.dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["output_linear_w"].astype(x.dtype) + p["output_linear_b"].astype(x.dtype)
    half = y.shape[-1] // 2
    y = y[..., :half] * jax.nn.sigmoid(y[..., half:])
    y = y * jax.nn.silu(z)
    out = y @ p["out_proj"].astype(y.dtype)
    new_cache = dict(cache)
    new_cache["conv_state"] = conv_state
    new_cache["s4_state"] = _jc2r(s)
    return new_cache, out


# ---------------------------------------------------------------------------
# init (training from scratch)
# ---------------------------------------------------------------------------

def _hippo_legs_nplr(N: int):
    """HiPPO-LegS NPLR decomposition (S4 paper; reference S4_fuctions.py
    transition/nplr :287-440).  Returns complex (w (N/2,), P (N/2,),
    B (N/2,)) — the conjugate half with negative imaginary part."""
    q = np.arange(N, dtype=np.float64)
    col, row = np.meshgrid(q, q, indexing="ij")
    r = np.sqrt(2 * q + 1)
    A = -np.where(col > row, r[:, None] * r[None, :], 0.0) - np.diag(q + 1)
    B = np.sqrt(2 * q + 1)
    P = np.sqrt(q + 0.5)
    S = A + P[:, None] * P[None, :]
    w_re = np.mean(np.diag(S))  # = -0.5
    w_im, V = np.linalg.eigh(S * -1j)
    w = w_re + 1j * w_im
    # keep the half with negative imaginary part (sorted ascending by imag)
    idx = np.argsort(w.imag)
    w = w[idx][: N // 2]
    V = V[:, idx][:, : N // 2]
    V_inv = V.conj().T
    B_c = V_inv @ B.astype(np.complex128)
    P_c = V_inv @ P.astype(np.complex128)
    return w, P_c, B_c


def mixer_init(key, cfg, dtype=jnp.float32, d_state_s4: int = 16, n_modes: int = 64,
               dt_min: float = 0.001, dt_max: float = 0.1):
    """MambaS4 init: torch Linear defaults for projections; HiPPO-LegS NPLR
    for the kernel; dt log-uniform; C ~ complex randn."""
    d_model = cfg.tsfm_d_model
    d_inner = cfg.d_inner
    d_conv = cfg.d_conv
    H = d_state_s4
    ks = jax.random.split(key, 8)

    def lin(k, fan_in, shape):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    conv_bound = 1.0 / math.sqrt(d_conv)
    w, P_c, B_c = _hippo_legs_nplr(n_modes)
    N = n_modes // 2
    rng = np.random.default_rng(int(jax.random.randint(ks[5], (), 0, 2**31 - 1)))
    C = (rng.normal(size=(1, H, N)) + 1j * rng.normal(size=(1, H, N))) / math.sqrt(2)
    inv_dt = rng.uniform(math.log(dt_min), math.log(dt_max), size=(H, 1))
    A_tiled = np.tile(w[None, :], (H, 1))
    kernel = {
        "A_real": np.log(-A_tiled.real).astype(np.float32),
        "A_imag": (-A_tiled.imag).astype(np.float32),
        "B": _c2r(np.tile(B_c[None, None, :], (1, H, 1))),
        "C": _c2r(C),
        "P": _c2r(np.tile(P_c[None, None, :], (1, H, 1))),
        "inv_dt": inv_dt.astype(np.float32),
        "l_kernel": StaticInt(0),
    }
    out_bound = 1.0 / math.sqrt(d_inner)
    out = jax.random.uniform(ks[4], (d_inner, d_model), jnp.float32, -out_bound, out_bound)
    out = out / math.sqrt(cfg.tsfm_n_layers)
    return {
        "in_proj": lin(ks[0], d_model, (d_model, 2 * d_inner)),
        "conv_w": jax.random.uniform(ks[1], (d_conv, d_inner), dtype, -conv_bound, conv_bound),
        "conv_b": jax.random.uniform(
            jax.random.fold_in(ks[1], 1), (d_inner,), dtype, -conv_bound, conv_bound
        ),
        "input_linear_w": lin(ks[2], d_inner, (d_inner, H)),
        "input_linear_b": lin(jax.random.fold_in(ks[2], 1), d_inner, (H,)),
        "kernel": kernel,
        "ssm_D": jnp.asarray(rng.normal(size=(1, H)), dtype),
        "output_linear_w": lin(ks[3], H, (H, 2 * d_inner)),
        "output_linear_b": lin(jax.random.fold_in(ks[3], 1), H, (2 * d_inner,)),
        "out_proj": out.astype(dtype),
    }
