"""Selective state-space scan (Mamba SSM recurrence), TPU-first.

Replaces the reference's CUDA ``selective_scan_fn`` / Triton
``selective_state_update`` (mamba-ssm, used via
/root/reference/src/network/CleanUMamba.py:172-189 and :451-453).

The recurrence, with diagonal ``A`` (d_inner, d_state):

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * u_t        (outer over state)
    y_t = <h_t, C_t> + D * u_t

Design: the scan is linear in ``h`` with elementwise coefficients, so it is
an associative scan on pairs ``(a, b) -> (a2*a1, a2*b1 + b2)``.  We chunk the
time axis: a sequential ``lax.scan`` over chunks carries the (B, d_inner,
d_state) state in fp32, and inside each chunk ``lax.associative_scan``
parallelises over time.  This keeps peak memory at
``O(chunk * d_inner * d_state)`` instead of ``O(L * d_inner * d_state)`` while
exposing enough parallel work per step for the VPU.  The same chunked-carry
math is what a sequence-parallel multi-chip scan would use.

All state math is fp32 regardless of input dtype (parity with the CUDA
kernel's fp32 state; survey §7 "Selective-scan numerics").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ssm_coeffs(u, dt, A, B):
    """Per-step transition/input coefficients in fp32.

    u, dt: (B, T, d_inner); A: (d_inner, d_state); B: (B, T, d_state)
    returns a, b: (B, T, d_inner, d_state)
    """
    dt = dt.astype(jnp.float32)
    a = jnp.exp(dt[..., None] * A.astype(jnp.float32))
    b = (dt * u.astype(jnp.float32))[..., None] * B.astype(jnp.float32)[:, :, None, :]
    return a, b


def selective_scan(u, dt, A, B, C, D=None, h0=None, chunk: int = 32, unroll: int = 1):
    """Chunked associative selective scan.

    Args:
      u:  (batch, L, d_inner) input (post conv+SiLU).
      dt: (batch, L, d_inner) softplus'd timestep.
      A:  (d_inner, d_state) negative real transition (= -exp(A_log)).
      B:  (batch, L, d_state) input projection.
      C:  (batch, L, d_state) output projection.
      D:  (d_inner,) skip, or None.
      h0: (batch, d_inner, d_state) fp32 initial state, or None for zeros.
      chunk: time chunk size (static).

    Returns:
      y: (batch, L, d_inner) in u.dtype; h_last: (batch, d_inner, d_state) fp32.
    """
    Bsz, L, d_inner = u.shape
    d_state = A.shape[1]
    if h0 is None:
        h0 = jnp.zeros((Bsz, d_inner, d_state), jnp.float32)
    else:
        h0 = h0.astype(jnp.float32)

    # Pad L to a multiple of chunk with dt=0 steps (a=1, b=0: identity).
    n_chunks = -(-L // chunk)
    pad = n_chunks * chunk - L
    if pad:
        u_p = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        dt_p = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B_p = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C_p = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    else:
        u_p, dt_p, B_p, C_p = u, dt, B, C

    def reshape_chunks(x):
        return x.reshape(Bsz, n_chunks, chunk, *x.shape[2:]).swapaxes(0, 1)

    xs = tuple(map(reshape_chunks, (u_p, dt_p, B_p, C_p)))

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    def chunk_step(h, chunk_inputs):
        uc, dtc, Bc, Cc = chunk_inputs  # (batch, chunk, ...)
        a, b = _ssm_coeffs(uc, dtc, A, Bc)
        a_cum, b_cum = lax.associative_scan(combine, (a, b), axis=1)
        h_t = a_cum * h[:, None] + b_cum  # (batch, chunk, d_inner, d_state)
        y = jnp.einsum(
            "btis,bts->bti", h_t, Cc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return h_t[:, -1], y

    h_last, ys = lax.scan(chunk_step, h0, xs, unroll=unroll)
    y = ys.swapaxes(0, 1).reshape(Bsz, n_chunks * chunk, d_inner)[:, :L]
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)
    return y.astype(u.dtype), h_last


def selective_scan_ref(u, dt, A, B, C, D=None, h0=None):
    """Naive per-timestep reference scan (test oracle; also exact math)."""
    Bsz, L, d_inner = u.shape
    d_state = A.shape[1]
    if h0 is None:
        h0 = jnp.zeros((Bsz, d_inner, d_state), jnp.float32)
    else:
        h0 = h0.astype(jnp.float32)

    a, b = _ssm_coeffs(u, dt, A, B)

    def step(h, inputs):
        a_t, b_t, C_t = inputs
        h = a_t * h + b_t
        y = jnp.einsum("bis,bs->bi", h, C_t.astype(jnp.float32))
        return h, y

    h_last, ys = lax.scan(step, h0, (a.swapaxes(0, 1), b.swapaxes(0, 1), C.swapaxes(0, 1)))
    y = ys.swapaxes(0, 1)
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)
    return y.astype(u.dtype), h_last


def selective_scan_step(h, u, dt, A, B, C, D=None):
    """Single-timestep update for streaming (replaces Triton
    ``selective_state_update``, reference CleanUMamba.py:451-453).

    h: (batch, d_inner, d_state) fp32; u, dt: (batch, d_inner);
    B, C: (batch, d_state).  Returns (h', y) with y in u.dtype.
    """
    dtf = dt.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    a = jnp.exp(dtf[..., None] * A.astype(jnp.float32))
    b = (dtf * uf)[..., None] * B.astype(jnp.float32)[:, None, :]
    h = a * h.astype(jnp.float32) + b
    y = jnp.einsum("bis,bs->bi", h, C.astype(jnp.float32))
    if D is not None:
        y = y + uf * D.astype(jnp.float32)
    return h, y.astype(u.dtype)
