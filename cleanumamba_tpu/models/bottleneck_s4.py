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


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class StaticStr:
    """Static string metadata inside a param pytree (kernel mode tags)."""

    value: str

    def __str__(self):
        return self.value


def _lk(kp) -> int:
    return int(kp["l_kernel"])


def _on_host_cpu():
    """Context manager pinning eager ops to the CPU backend.  The axon TPU
    relay lacks standalone eager kernels for some complex primitives
    (conjugate); the one-time host-side prep (dense discretisation, kernel
    doubling, cache build) runs on CPU — results transfer on first use."""
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def _tag(kp, key: str, default: str) -> str:
    v = kp.get(key)
    return default if v is None else str(v)


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


import functools


@functools.partial(jax.jit, static_argnames=("L",))
def s4_dplr_kernel(kp, L: int):
    """Length-L convolution kernel K (C, H, L) real.

    Jitted with static L (a no-op when already under an outer jit): the
    axon TPU relay has no EAGER kernels for complex primitives, so the
    frequency-domain math must always run compiled.

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
# S4D diagonal kernels (SSMKernelDiag, S4_fuctions.py:964-1151): zoh /
# bilinear / dss discretisations of a purely diagonal state matrix.  Unlike
# the DPLR kernel there is no Woodbury correction and no attunement — the
# kernel is a log-Vandermonde sum evaluated directly for any L.
# ---------------------------------------------------------------------------

def _diag_views(kp):
    """dt (H,1), A (H,N), BC (C,H,N) combined per the reference
    (S4_fuctions.py:1113 ``C = B[:, None] * C``)."""
    dt = jnp.exp(kp["inv_dt"].astype(jnp.float32))
    A = -jnp.exp(kp["A_real"].astype(jnp.float32)) - 1j * kp["A_imag"].astype(jnp.float32)
    B = _r2c(kp["B"].astype(jnp.float32))  # (1, H, N)
    C = _r2c(kp["C"].astype(jnp.float32))  # (C, H, N)
    return dt, A, B * C


def _log_vandermonde(v, x, L):
    """2·Re( Σ_n v_n · exp(x_n · l) ) for l in [0, L)
    (reference log_vandermonde_naive, S4_fuctions.py:153-161)."""
    ls = jnp.arange(L, dtype=jnp.float32)
    vm = jnp.exp(x[..., None] * ls)  # (..., N, L)
    return 2.0 * jnp.einsum("chn,hnl->chl", v, vm).real


@functools.partial(jax.jit, static_argnames=("L", "disc"))
def s4_diag_kernel(kp, L: int, disc: str = "zoh"):
    """Length-L S4D convolution kernel K (C, H, L) real.  Jitted with
    static (L, disc) — see s4_dplr_kernel on eager complex ops.

    Parity with SSMKernelDiag.forward (S4_fuctions.py:1119-1151) for
    disc in {'zoh', 'bilinear', 'dss'}."""
    dt, A, BC = _diag_views(kp)
    dtA = dt * A  # (H, N)
    if disc == "zoh":
        v = BC * (jnp.exp(dtA) - 1.0) / A
        return _log_vandermonde(v, dtA, L)
    if disc == "bilinear":
        v = BC * (1.0 / (1.0 - dtA / 2.0)) * dt
        dA = (1.0 + dtA / 2.0) / (1.0 - dtA / 2.0)
        return _log_vandermonde(v, jnp.log(dA.astype(jnp.complex64)), L)
    if disc == "dss":
        # DSS normalisation; guards eigenvalues with positive real part
        # (S4_fuctions.py:1131-1148)
        ls = jnp.arange(L, dtype=jnp.float32)
        P = dtA[..., None] * ls  # (H, N, L)
        A_gt_0 = A.real > 0
        P_max = dtA * (A_gt_0 * (L - 1))
        P = P - P_max[..., None]
        S = jnp.exp(P)
        dtA_neg = dtA * (1 - 2 * A_gt_0)
        num = jnp.exp(dtA_neg) - 1.0
        den = jnp.exp(dtA_neg * L) - 1.0
        x = den * A
        r = jnp.conj(x) / (x * jnp.conj(x) + 1e-7)
        v = BC * num * r
        return jnp.einsum("chn,hnl->chl", v, S).real
    raise ValueError(f"disc={disc!r} not supported (zoh|bilinear|dss)")


def s4_diag_discrete(kp, disc: str = "zoh"):
    """Diagonal discretised system for streaming: dA, dB (H, N) complex and
    dC (C, H, N) with the implicit conjugate-pair doubling folded into dC
    (y = 2·Re(Σ dC·s)); mirrors SSMKernelDiag._setup_step."""
    dt = jnp.exp(kp["inv_dt"].astype(jnp.float32))
    A = -jnp.exp(kp["A_real"].astype(jnp.float32)) - 1j * kp["A_imag"].astype(jnp.float32)
    B = _r2c(kp["B"].astype(jnp.float32))[0]  # (H, N)
    C = _r2c(kp["C"].astype(jnp.float32))  # (C, H, N)
    dtA = dt * A
    if disc == "zoh":
        dA = jnp.exp(dtA)
        dB = B * (jnp.exp(dtA) - 1.0) / A
    elif disc == "bilinear":
        dA = (1.0 + dtA / 2.0) / (1.0 - dtA / 2.0)
        dB = B * (1.0 / (1.0 - dtA / 2.0)) * dt
    else:
        raise ValueError(f"disc={disc!r} has no step form (zoh|bilinear)")
    return dA, dB, 2.0 * C


# Kernel registry (reference S4_fuctions.py:1612-1618): name -> callable
# (kernel_params, L) -> (C, H, L).  The diag entries close over their
# discretisation; 'dss' is exposed under its own name as in the DSS paper.
kernel_registry = {
    "s4d": lambda kp, L: s4_diag_kernel(kp, L, disc=_tag(kp, "disc", "zoh")),
    "diag": lambda kp, L: s4_diag_kernel(kp, L, disc=_tag(kp, "disc", "zoh")),
    "dss": lambda kp, L: s4_diag_kernel(kp, L, disc="dss"),
    "s4": lambda kp, L: s4_dplr_kernel(kp, L),
    "nplr": lambda kp, L: s4_dplr_kernel(kp, L),
    "dplr": lambda kp, L: s4_dplr_kernel(kp, L),
}


def s4_kernel(kp, L: int):
    """Dispatch on the kernel params' static ``mode`` tag (default dplr —
    the mode every released CleanUMamba checkpoint uses)."""
    return kernel_registry[_tag(kp, "mode", "dplr")](kp, L)


def s4d_init_kernel(H: int, N: int = 64, disc: str = "zoh",
                    dt_min: float = 0.001, dt_max: float = 0.1, seed: int = 0):
    """S4D kernel params: HiPPO-LegS diagonal approximation (the reference's
    default `legs` init with the low-rank part dropped, S4D paper §3) over
    the conjugate half N//2; dt log-uniform (init_dt, S4_fuctions.py:809-824)."""
    w, _, B_c = _hippo_legs_nplr(N)
    rng = np.random.default_rng(seed)
    n = N // 2
    C = (rng.normal(size=(1, H, n)) + 1j * rng.normal(size=(1, H, n))) / math.sqrt(2)
    inv_dt = rng.uniform(math.log(dt_min), math.log(dt_max), size=(H, 1))
    A = np.tile(w[None, :], (H, 1))
    return {
        "A_real": np.log(np.maximum(-A.real, 1e-4)).astype(np.float32),
        "A_imag": (-A.imag).astype(np.float32),
        "B": _c2r(np.tile(B_c[None, None, :], (1, H, 1))),
        "C": _c2r(C),
        "inv_dt": inv_dt.astype(np.float32),
        "mode": StaticStr(disc if disc == "dss" else "s4d"),
        "disc": StaticStr(disc),
    }


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
    if "l_kernel" not in kp:  # diagonal kernels need no attunement
        return kp
    l_ker = int(kp["l_kernel"])
    if 0 < l_ker and L <= l_ker:
        return kp
    with _on_host_cpu():
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

def fft_long_conv(p, u):
    """The S4 long convolution core on (B, L, H) inputs: length-L kernel via
    the mode-dispatched registry, FFT conv padded to 2L (causal), D skip,
    flatten C=1 channels, exact GELU (MambaS4.py:127-136).  Shared by the
    offline mixer and the tensor-parallel mixer (parallel/tensor.py), which
    runs it replicated on the full tiny-H ``u``."""
    B_, L, H = u.shape
    k = s4_kernel(p["kernel"], L)  # (C=1, H, L), mode-dispatched
    n = 2 * L
    uf = jnp.fft.rfft(u.astype(jnp.float32), n=n, axis=1)  # (B, F, H)
    kf = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-1)  # (C, H, F)
    yf = uf[:, None] * jnp.moveaxis(kf, -1, 1)[None]  # (B, C, F, H)
    y = jnp.fft.irfft(yf, n=n, axis=2)[:, :, :L, :]  # (B, C, L, H)
    # D skip (MambaS4.py:136): y[b,c,l,h] += u[b,l,h] * D[c,h]
    y = y + u.astype(jnp.float32)[:, None] * p["ssm_D"].astype(jnp.float32)[None, :, None, :]
    # flatten channels (c h) with C=1 -> (B, L, H)
    y = y[:, 0].astype(u.dtype)
    return jax.nn.gelu(y, approximate=False)


def _s4block_forward(p, x):
    """S4Block around FFTConv.  x: (B, L, d_inner) -> (B, L, d_inner)."""
    u = x @ p["input_linear_w"].astype(x.dtype) + p["input_linear_b"].astype(x.dtype)
    y = fft_long_conv(p, u)
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
    with _on_host_cpu():
        if "P" in p["kernel"]:  # DPLR: dense rank-1 system + de-attuned C
            dA, dB = _dense_discrete(p["kernel"])
            dC = _dC_from_Ctilde(p["kernel"], dA)
        else:  # diagonal (S4D): half-system, conj doubling folded into dC
            dAd, dB, dC = s4_diag_discrete(
                p["kernel"], _tag(p["kernel"], "disc", "zoh"))
            dA = dAd[:, :, None] * jnp.eye(dAd.shape[-1], dtype=jnp.complex64)[None]
        dA_r, dB_r, dC_r = _jc2r(dA), _jc2r(dB), _jc2r(dC)
    H, N2 = dB.shape
    return {
        "conv_state": jnp.zeros((batch_size, d_conv, d_inner), dtype),
        "s4_state": jnp.zeros((batch_size, H, N2, 2), jnp.float32),
        # discretised system matrices ride in the cache (derived, not params)
        "dA": dA_r,
        "dB": dB_r,
        "dC": dC_r,
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


def sp_discrete_system(p):
    """Host-side prep for sequence parallelism: the mixer's constant
    discrete SSM ``s' = dA s + dB u, y = Re(dC s)`` exactly as the streaming
    step carries it (mixer_init_cache), as real-pair arrays (complex leaves
    cannot cross the jit boundary on the axon relay): ``{"dA": (H,N,N,2),
    "dB": (H,N,2), "dC": (C,H,N,2)}``.

    Deliberately NOT eigendecomposed: diagonalizing the DPLR transition is
    catastrophically ill-conditioned at fp32 runtime (measured: cond(V) ~
    1e8, transformed |B̂| ~ 4e6, kernel reconstruction error O(1) in
    complex64 — the same failure mode the S4 paper gives for naive
    diagonalization of HiPPO).  The cross-device composition instead uses
    dense ``dA^T`` via repeated squaring (parallel/sequence.py::_sp_mixer_s4),
    which stays at the step form's own conditioning.
    """
    with _on_host_cpu():
        if "P" in p["kernel"]:
            dA, dB = _dense_discrete(p["kernel"])
            dC = _dC_from_Ctilde(p["kernel"], dA)
        else:
            dAd, dB, dC = s4_diag_discrete(
                p["kernel"], _tag(p["kernel"], "disc", "zoh"))
            dA = dAd[:, :, None] * jnp.eye(
                dAd.shape[-1], dtype=jnp.complex64)[None]
        dA, dB, dC = (np.asarray(dA, np.complex64), np.asarray(dB, np.complex64),
                      np.asarray(dC, np.complex64))
    if dC.shape[0] != 1:
        raise NotImplementedError(
            f"sequence parallelism assumes n_ssm_channels == 1, got {dC.shape[0]}")
    return {"dA": _c2r(dA), "dB": _c2r(dB), "dC": _c2r(dC)}


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
               dt_min: float = 0.001, dt_max: float = 0.1,
               kernel_type: str = "dplr"):
    """MambaS4 init: torch Linear defaults for projections; HiPPO-LegS NPLR
    for the kernel; dt log-uniform; C ~ complex randn.

    kernel_type: any kernel_registry name — 'dplr' (default, what the
    released checkpoints use) or 's4d'/'diag'/'dss' for the diagonal family."""
    d_model = cfg.tsfm_d_model
    d_inner = cfg.d_inner
    d_conv = cfg.d_conv
    H = d_state_s4
    ks = jax.random.split(key, 8)

    def lin(k, fan_in, shape):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    conv_bound = 1.0 / math.sqrt(d_conv)
    seed = int(jax.random.randint(ks[5], (), 0, 2**31 - 1))
    if kernel_type in ("s4d", "diag", "dss"):
        disc = "dss" if kernel_type == "dss" else "zoh"
        kernel = s4d_init_kernel(H, n_modes, disc=disc, dt_min=dt_min,
                                 dt_max=dt_max, seed=seed)
        rng = np.random.default_rng(seed + 1)
    else:
        w, P_c, B_c = _hippo_legs_nplr(n_modes)
        N = n_modes // 2
        rng = np.random.default_rng(seed)
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
