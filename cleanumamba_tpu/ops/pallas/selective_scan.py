"""Pallas TPU selective-scan kernel.

Replaces the XLA chunked associative scan (ops/scan.py) on the inference hot
path.  The XLA version materialises the per-step coefficient tensors of
shape (B, L, d_state, d_inner) in HBM (~640 MB of traffic for a 10 s E8
clip); this kernel keeps the recurrent state and all per-step coefficients
in VMEM, streaming only u/dt/B/C in and y out.

Grid: (batch, d_inner tiles, L chunks) — the L-chunk axis iterates
sequentially on the TensorCore, so the fp32 state scratch persists across
chunk steps (standard TPU accumulation pattern).  Within a chunk the
recurrence h' = a*h + b runs as a fori_loop of (d_state, TILE_D) VPU ops —
d_inner on the lane axis (d_state=64 on lanes would waste half of every
(8,128) fp32 tile; see docs/performance.md "lane packing").

Gradients: wrapped in ``jax.custom_vjp`` whose backward runs the chunked
sequential reverse scan (ops.scan.selective_scan_grad) — not AD through the
associative scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _scan_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, h0_ref,
                 y_ref, h_last_ref, h_bounds_ref, h_scratch):
    """One (batch, d-tile, L-chunk) grid cell.

    Block shapes (state layout transposed: d_inner on lanes):
      u, dt: (1, CHUNK, TILE_D); B, C: (1, CHUNK, d_state);
      A: (d_state, TILE_D); D: (1, TILE_D); h0: (1, d_state, TILE_D);
      y out: (1, CHUNK, TILE_D); h_last out: (1, d_state, TILE_D);
      h_bounds out: (1, 1, d_state, TILE_D) — the chunk's INCOMING state,
      saved so a custom backward can recompute per chunk without re-running
      the whole forward.
    """
    chunk_idx = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    @pl.when(chunk_idx == 0)
    def _():
        h_scratch[:] = h0_ref[0]

    h_bounds_ref[0, 0] = h_scratch[:]

    A = A_ref[:]  # (d_state, TILE_D)
    D = D_ref[0, :]  # (TILE_D,)
    chunk = u_ref.shape[1]

    def step(t, _):
        u_t = u_ref[0, t, :]  # (TILE_D,)
        dt_t = dt_ref[0, t, :]
        B_t = B_ref[0, t, :]  # (d_state,)
        C_t = C_ref[0, t, :]
        a = jnp.exp(dt_t[None, :] * A)  # (d_state, TILE_D)
        b = (dt_t * u_t)[None, :] * B_t[:, None]
        h = a * h_scratch[:] + b
        h_scratch[:] = h
        y_ref[0, t, :] = jnp.sum(h * C_t[:, None], axis=0) + D * u_t
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(chunk_idx == n_chunks - 1)
    def _():
        h_last_ref[0] = h_scratch[:]


def pallas_available() -> bool:
    """True when the default backend is a TPU with Pallas support."""
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def pallas_selective_scan(u, dt, A, B, C, D=None, h0=None,
                          chunk: int = 128, tile_d: int = 512,
                          interpret: bool = False,
                          return_boundaries: bool = False):
    """Selective scan on TPU via Pallas.  Same contract as
    ops.scan.selective_scan: u, dt (B, L, d_inner) / A (d_inner, d_state) /
    B, C (B, L, d_state) / D (d_inner,) -> (y (B, L, d_inner), h_last fp32
    (B, d_inner, d_state)).

    return_boundaries: additionally return the per-chunk incoming states
    (n_chunks, B, d_state, d_inner) fp32, the residuals the chunked reverse
    backward needs (ops.scan._ssg_bwd) — saves re-running the forward there.

    All compute fp32 (cast on entry).  L is padded to a chunk multiple with
    dt=0 identity steps; d_inner to a tile multiple with A=0 inert rows.
    """
    Bsz, L, d_inner = u.shape
    d_state = A.shape[1]
    f32 = jnp.float32
    u, dt, B, C = (x.astype(f32) for x in (u, dt, B, C))
    A = A.astype(f32)
    Dv = jnp.zeros((d_inner,), f32) if D is None else D.astype(f32)
    if h0 is None:
        h0 = jnp.zeros((Bsz, d_inner, d_state), f32)
    else:
        h0 = h0.astype(f32)

    tile_d = min(tile_d, max(8, d_inner))
    n_tiles = -(-d_inner // tile_d)
    pad_d = n_tiles * tile_d - d_inner
    n_chunks = -(-L // chunk)
    pad_l = n_chunks * chunk - L
    if pad_l:
        u = jnp.pad(u, ((0, 0), (0, pad_l), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad_l), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad_l), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad_l), (0, 0)))
    if pad_d:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, pad_d)))
        dt = jnp.pad(dt, ((0, 0), (0, 0), (0, pad_d)))
        A = jnp.pad(A, ((0, pad_d), (0, 0)))
        Dv = jnp.pad(Dv, (0, pad_d))
        h0 = jnp.pad(h0, ((0, 0), (0, pad_d), (0, 0)))
    Dp = d_inner + pad_d
    Lp = L + pad_l

    A_t = A.T  # (d_state, Dp): d_inner on lanes
    h0_t = h0.swapaxes(-1, -2)  # (B, d_state, Dp)

    grid = (Bsz, n_tiles, n_chunks)
    y, h_last, h_bounds = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, tile_d), lambda b, d, c: (b, c, d)),  # u
            pl.BlockSpec((1, chunk, tile_d), lambda b, d, c: (b, c, d)),  # dt
            pl.BlockSpec((d_state, tile_d), lambda b, d, c: (0, d)),  # A^T
            pl.BlockSpec((1, chunk, d_state), lambda b, d, c: (b, c, 0)),  # B
            pl.BlockSpec((1, chunk, d_state), lambda b, d, c: (b, c, 0)),  # C
            pl.BlockSpec((1, tile_d), lambda b, d, c: (0, d)),  # D
            pl.BlockSpec((1, d_state, tile_d), lambda b, d, c: (b, 0, d)),  # h0^T
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, tile_d), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((1, d_state, tile_d), lambda b, d, c: (b, 0, d)),
            pl.BlockSpec((1, 1, d_state, tile_d), lambda b, d, c: (b, c, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, Lp, Dp), f32),
            jax.ShapeDtypeStruct((Bsz, d_state, Dp), f32),
            jax.ShapeDtypeStruct((Bsz, n_chunks, d_state, Dp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((d_state, tile_d), f32)],
        interpret=interpret,
    )(u, dt, A_t, B, C, Dv.reshape(1, Dp), h0_t)

    y = y[:, :L, :d_inner]
    h_last = h_last[:, :, :d_inner].swapaxes(-1, -2)
    if return_boundaries:
        # -> (n_chunks, B, d_state, d_inner): the layout _ssg_bwd consumes
        h_starts = jnp.moveaxis(h_bounds[:, :, :, :d_inner], 1, 0)
        return y, h_last, h_starts
    return y, h_last


# One internal time-chunk size shared by the Pallas forward and the chunked
# reverse backward, so the kernel's saved boundary states line up with what
# the backward recomputes per chunk.
_VJP_CHUNK = 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def selective_scan_auto(u, dt, A, B, C, D, h0, chunk=128):
    """Differentiable wrapper: Pallas forward on TPU; backward is the chunked
    sequential reverse scan seeded by the kernel's saved boundary states (no
    forward re-run, no AD through the associative scan)."""
    y, h_last = pallas_selective_scan(u, dt, A, B, C, D, h0, chunk=_VJP_CHUNK)
    return y, h_last


def _fwd(u, dt, A, B, C, D, h0, chunk):
    y, h_last, h_starts = pallas_selective_scan(
        u, dt, A, B, C, D, h0, chunk=_VJP_CHUNK, return_boundaries=True
    )
    return (y, h_last), (u, dt, A, B, C, D, h0, h_starts)


def _bwd(chunk, res, cts):
    from cleanumamba_tpu.ops.scan import _ssg_bwd

    return _ssg_bwd(_VJP_CHUNK, res, cts)


selective_scan_auto.defvjp(_fwd, _bwd)
