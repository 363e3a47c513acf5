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


def _pair_scan_hs(a, b, reverse: bool = False):
    """Hillis-Steele inclusive scan of the linear-recurrence semigroup
    ``(a, b) -> (a_r*a_l, a_r*b_l + b_r)`` along axis 0 — O(T log T) work;
    kept as the any-length fallback."""
    T = a.shape[0]
    d = 1
    while d < T:
        if reverse:
            ta = jnp.concatenate([a[d:], jnp.ones_like(a[:d])], axis=0)
            tb = jnp.concatenate([b[d:], jnp.zeros_like(b[:d])], axis=0)
        else:
            ta = jnp.concatenate([jnp.ones_like(a[:d]), a[:-d]], axis=0)
            tb = jnp.concatenate([jnp.zeros_like(b[:d]), b[:-d]], axis=0)
        b = a * tb + b
        a = a * ta
        d *= 2
    return a, b


def _pair_scan(a, b, reverse: bool = False):
    """Vectorized inclusive scan of the linear-recurrence semigroup along
    axis 0; ``reverse=True`` computes the suffix scan (adjoint recurrence).

    All work is full-tensor VPU ops on VMEM values — no per-timestep
    ``fori_loop`` (which pays per-step dynamic-slice and control overhead;
    measured 20x off bandwidth-bound on v5e).  Power-of-two lengths use a
    work-efficient even/odd recursion (~2T combines instead of Hillis-
    Steele's T·log2(T)): scan the pairwise-combined half-length sequence,
    which directly yields the odd-position prefixes; even positions are one
    more combine with the shifted odd prefixes.

    The suffix scan runs the mirrored recursion directly (``jnp.flip``
    lowers to the `rev` primitive, which Mosaic does not implement).
    Semigroup segment values: forward [t..u] composes as
    (P1·P2, P2·Q1 + Q2); reverse composes as (P1·P2, Q1 + P1·Q2).
    """
    T = a.shape[0]
    if T == 1:
        return a, b
    if T % 2:
        return _pair_scan_hs(a, b, reverse=reverse)
    a2 = a.reshape(T // 2, 2, *a.shape[1:])
    b2 = b.reshape(T // 2, 2, *b.shape[1:])
    ae, be = a2[:, 0], b2[:, 0]
    ao, bo = a2[:, 1], b2[:, 1]
    # T == 2 guards: a zero-length As[:-1]/As[1:] slice is not a valid
    # Mosaic vector type.
    if reverse:
        # pair segment (even then odd) under reverse composition; the
        # half-scan gives suffixes at EVEN positions, odds are one more
        # combine with the NEXT even suffix (identity at the end)
        As, Bs = _pair_scan(ae * ao, be + ae * bo, reverse=True)
        if T == 2:
            Ash, Bsh = jnp.ones_like(As), jnp.zeros_like(Bs)
        else:
            Ash = jnp.concatenate([As[1:], jnp.ones_like(As[:1])], axis=0)
            Bsh = jnp.concatenate([Bs[1:], jnp.zeros_like(Bs[:1])], axis=0)
        aod = ao * Ash
        bod = bo + ao * Bsh
        a_out = jnp.stack([As, aod], axis=1).reshape(T, *a.shape[1:])
        b_out = jnp.stack([Bs, bod], axis=1).reshape(T, *b.shape[1:])
        return a_out, b_out
    # forward: combine each (even, odd) pair -> half-length sequence; odd
    # outputs are the half-scan directly, evens combine the PREVIOUS odd
    # prefix (identity at the front) with the even element
    As, Bs = _pair_scan(ae * ao, ao * be + bo)
    if T == 2:
        Ash, Bsh = jnp.ones_like(As), jnp.zeros_like(Bs)
    else:
        Ash = jnp.concatenate([jnp.ones_like(As[:1]), As[:-1]], axis=0)
        Bsh = jnp.concatenate([jnp.zeros_like(Bs[:1]), Bs[:-1]], axis=0)
    aev = Ash * ae
    bev = ae * Bsh + be
    a_out = jnp.stack([aev, As], axis=1).reshape(T, *a.shape[1:])
    b_out = jnp.stack([bev, Bs], axis=1).reshape(T, *b.shape[1:])
    return a_out, b_out


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

    The within-chunk recurrence runs as a vectorized pair scan (_pair_scan)
    over the (CHUNK, d_state, TILE_D) coefficient tensors held in VMEM.
    """
    chunk_idx = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    @pl.when(chunk_idx == 0)
    def _():
        h_scratch[:] = h0_ref[0]

    h_bounds_ref[0, 0] = h_scratch[:]

    f32 = jnp.float32
    A = A_ref[:]  # (d_state, TILE_D)
    # inputs stream in their native dtype (bf16 under mixed-precision
    # training — HALF the HBM traffic of a pre-cast f32 copy); all math f32
    dt = dt_ref[0].astype(f32)  # (CHUNK, TILE_D)
    u = u_ref[0].astype(f32)
    a = jnp.exp(dt[:, None, :] * A[None])  # (CHUNK, d_state, TILE_D)
    b = (dt * u)[:, None, :] * B_ref[0].astype(f32)[:, :, None]
    a_cum, b_cum = _pair_scan(a, b)
    h = a_cum * h_scratch[None] + b_cum  # (CHUNK, d_state, TILE_D)
    h_scratch[:] = h[u.shape[0] - 1]
    y = jnp.sum(h * C_ref[0].astype(f32)[:, :, None], axis=1) + D_ref[0] * u
    y_ref[0] = y.astype(y_ref.dtype)

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
                          chunk: int = 32, tile_d: int = 256,
                          interpret: bool = False,
                          return_boundaries: bool = False):
    """Selective scan on TPU via Pallas.  Same contract as
    ops.scan.selective_scan: u, dt (B, L, d_inner) / A (d_inner, d_state) /
    B, C (B, L, d_state) / D (d_inner,) -> (y (B, L, d_inner), h_last fp32
    (B, d_inner, d_state)).

    return_boundaries: additionally return the per-chunk incoming states
    (B, n_chunks, d_state, d_inner) fp32 — the residuals the Pallas backward
    seeds its adjoint recurrence from (saves re-running the forward).
    ``moveaxis(1, 0)`` recovers the (n_chunks, B, ...) layout the XLA
    fallback backward (ops.scan._ssg_bwd) consumes.

    All compute fp32 (cast on entry).  L is padded to a chunk multiple with
    dt=0 identity steps; d_inner to a tile multiple with A=0 inert rows.
    """
    Bsz, L, d_inner = u.shape
    d_state = A.shape[1]
    f32 = jnp.float32
    # u/dt/B/C stream to the kernel in their own dtype (cast happens in
    # VMEM); A/D/h0 are small and ride fp32
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
            jax.ShapeDtypeStruct((Bsz, Lp, Dp), u.dtype),
            jax.ShapeDtypeStruct((Bsz, d_state, Dp), f32),
            jax.ShapeDtypeStruct((Bsz, n_chunks, d_state, Dp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((d_state, tile_d), f32)],
        interpret=interpret,
    )(u, dt, A_t, B, C, Dv.reshape(1, Dp), h0_t)

    y = y[:, :L, :d_inner]
    h_last = h_last[:, :, :d_inner].swapaxes(-1, -2)
    if return_boundaries:
        # (B, n_chunks, d_state, d_inner) — what pallas_selective_scan_bwd
        # consumes; moveaxis(1, 0) gives the _ssg_bwd fallback layout.
        return y, h_last, h_bounds[:, :, :, :d_inner]
    return y, h_last


def _scan_bwd_kernel(u_ref, dt_ref, dtn_ref, B_ref, C_ref, gy_ref, A_ref,
                     D_ref, hs_ref, ghl_ref,
                     gu_ref, gdt_ref, gB_ref, gC_ref, gA_ref, gD_ref, gh0_ref,
                     lam_scratch, gA_scratch, gD_scratch):
    """Backward scan cell at grid (batch, rev-chunk, d-tile); d-tile is the
    innermost axis so the per-(batch, chunk) gB/gC output blocks accumulate
    across consecutive tile revisits without an HBM round-trip.

    Chunks iterate in reverse time order (index maps flip the chunk axis).
    Carries across chunks live in scratch keyed by tile: lam_scratch[d] is
    λ at the following chunk's first step; gA/gD accumulate over everything
    and are flushed by writing the running value every visit (the final
    grid step's write is the total).

    The adjoint recurrence λ_t = gy_t⊗C_t + a_{t+1}·λ_{t+1} runs as the same
    vectorized pair scan as the forward, right-to-left; h is recomputed per
    chunk from the forward kernel's saved incoming boundary state (hs_ref).
    a_{t+1} arrives as ``dtn`` = dt shifted left one step over the padded
    sequence (dt=0 ⇒ a=1 identity routes gh_last into λ_{L-1}).
    """
    cr = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    d = pl.program_id(2)

    f32 = jnp.float32
    A = A_ref[:]  # (d_state, TILE_D)
    u = u_ref[0].astype(f32)  # (T, TILE_D); streams in native (bf16) dtype
    dt = dt_ref[0].astype(f32)
    gy = gy_ref[0].astype(f32)
    Bc = B_ref[0].astype(f32)  # (T, d_state)
    Cc = C_ref[0].astype(f32)
    h_start = hs_ref[0, 0]  # (d_state, TILE_D)
    T = u.shape[0]

    @pl.when(cr == 0)
    def _():
        lam_scratch[d] = ghl_ref[0]

    @pl.when(jnp.logical_and(cr == 0, pl.program_id(0) == 0))
    def _():
        gA_scratch[d] = jnp.zeros_like(gA_scratch[d])
        gD_scratch[d] = jnp.zeros_like(gD_scratch[d])

    # recompute h within the chunk from the saved incoming state
    a = jnp.exp(dt[:, None, :] * A[None])  # (T, s, TILE_D)
    bb = (dt * u)[:, None, :] * Bc[:, :, None]
    a_cum, b_cum = _pair_scan(a, bb)
    h = a_cum * h_start[None] + b_cum
    h_prev = jnp.concatenate([h_start[None], h[: T - 1]], axis=0)

    # λ suffix scan over (a_next, q), seeded by the right-chunk carry
    a_next = jnp.exp(dtn_ref[0].astype(f32)[:, None, :] * A[None])
    q = gy[:, None, :] * Cc[:, :, None]
    ac, qc = _pair_scan(a_next, q, reverse=True)
    lam = qc + ac * lam_scratch[d][None]  # (T, s, TILE_D)
    lam_scratch[d] = lam[0]

    lha = lam * h_prev * a
    lamB = jnp.sum(lam * Bc[:, :, None], axis=1)  # (T, TILE_D)
    gdt_ref[0] = (jnp.sum(lha * A[None], axis=1) + lamB * u).astype(gdt_ref.dtype)
    gu_ref[0] = (dt * lamB + D_ref[0] * gy).astype(gu_ref.dtype)
    gB_blk = jnp.sum(lam * (dt * u)[:, None, :], axis=2)  # (T, d_state)
    gC_blk = jnp.sum(h * gy[:, None, :], axis=2)

    @pl.when(d == 0)
    def _():
        gB_ref[0] = gB_blk
        gC_ref[0] = gC_blk

    @pl.when(d != 0)
    def _():
        gB_ref[0] += gB_blk
        gC_ref[0] += gC_blk

    gA_scratch[d] += jnp.sum(lha * dt[:, None, :], axis=0)
    gD_scratch[d] += jnp.sum(gy * u, axis=0)
    gA_ref[:] = gA_scratch[d]
    gD_ref[0] = gD_scratch[d]

    @pl.when(cr == n_chunks - 1)
    def _():
        gh0_ref[0] = a[0] * lam[0]


def pallas_selective_scan_bwd(u, dt, A, B, C, D, h_starts, gy, gh_last,
                              chunk: int = 32, tile_d: int = 128,
                              interpret: bool = False):
    """VJP of the selective scan, fully in VMEM (replaces ops.scan._ssg_bwd's
    XLA chunked reverse, which materialises (B, L, d_state, d_inner) HBM
    coefficient tensors).

    h_starts: (B, n_chunks, d_state, d_inner) incoming chunk states saved by
    the forward kernel (``return_boundaries=True``) at the SAME chunk size.
    Returns (gu, gdt, gA, gB, gC, gD, gh0) with gh0 as (B, d_inner, d_state).
    """
    Bsz, L, d_inner = u.shape
    d_state = A.shape[1]
    f32 = jnp.float32
    # u/dt/B/C/gy stream to the kernel in their own dtype (cast in VMEM)
    A = A.astype(f32)
    Dv = jnp.zeros((d_inner,), f32) if D is None else D.astype(f32)
    ghl = gh_last.astype(f32)

    tile_d = min(tile_d, max(8, d_inner))
    n_tiles = -(-d_inner // tile_d)
    pad_d = n_tiles * tile_d - d_inner
    n_chunks = -(-L // chunk)
    pad_l = n_chunks * chunk - L
    assert h_starts.shape == (Bsz, n_chunks, d_state, d_inner), h_starts.shape
    if pad_l:
        pt = ((0, 0), (0, pad_l), (0, 0))
        u, dt, B, C, gy = (jnp.pad(x, pt) for x in (u, dt, B, C, gy))
    if pad_d:
        pd = ((0, 0), (0, 0), (0, pad_d))
        u, dt, gy = (jnp.pad(x, pd) for x in (u, dt, gy))
        A = jnp.pad(A, ((0, pad_d), (0, 0)))
        Dv = jnp.pad(Dv, (0, pad_d))
        ghl = jnp.pad(ghl, ((0, 0), (0, pad_d), (0, 0)))
        h_starts = jnp.pad(h_starts, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
    Dp = d_inner + pad_d
    # dt shifted left one step over the padded sequence (identity at the end)
    dt_next = jnp.concatenate([dt[:, 1:], jnp.zeros_like(dt[:, :1])], axis=1)

    A_t = A.T  # (d_state, Dp)
    ghl_t = ghl.swapaxes(-1, -2)  # (B, d_state, Dp)

    nc = n_chunks
    rev = lambda b, c, d: (b, nc - 1 - c, d)  # noqa: E731
    rev0 = lambda b, c, d: (b, nc - 1 - c, 0)  # noqa: E731

    grid = (Bsz, n_chunks, n_tiles)
    gu, gdt, gB, gC, gA_t, gD, gh0 = pl.pallas_call(
        _scan_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, tile_d), rev),  # u
            pl.BlockSpec((1, chunk, tile_d), rev),  # dt
            pl.BlockSpec((1, chunk, tile_d), rev),  # dt_next
            pl.BlockSpec((1, chunk, d_state), rev0),  # B
            pl.BlockSpec((1, chunk, d_state), rev0),  # C
            pl.BlockSpec((1, chunk, tile_d), rev),  # gy
            pl.BlockSpec((d_state, tile_d), lambda b, c, d: (0, d)),  # A^T
            pl.BlockSpec((1, tile_d), lambda b, c, d: (0, d)),  # D
            pl.BlockSpec((1, 1, d_state, tile_d),
                         lambda b, c, d: (b, nc - 1 - c, 0, d)),  # h_starts
            pl.BlockSpec((1, d_state, tile_d), lambda b, c, d: (b, 0, d)),  # gh_last
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, tile_d), rev),  # gu
            pl.BlockSpec((1, chunk, tile_d), rev),  # gdt
            pl.BlockSpec((1, chunk, d_state), rev0),  # gB (acc over tiles)
            pl.BlockSpec((1, chunk, d_state), rev0),  # gC (acc over tiles)
            pl.BlockSpec((d_state, tile_d), lambda b, c, d: (0, d)),  # gA^T
            pl.BlockSpec((1, tile_d), lambda b, c, d: (0, d)),  # gD
            pl.BlockSpec((1, d_state, tile_d), lambda b, c, d: (b, 0, d)),  # gh0
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u.shape, u.dtype),  # gu streams out native
            jax.ShapeDtypeStruct(u.shape, dt.dtype),  # gdt
            jax.ShapeDtypeStruct(B.shape, f32),  # gB/gC accumulate f32
            jax.ShapeDtypeStruct(C.shape, f32),
            jax.ShapeDtypeStruct((d_state, Dp), f32),
            jax.ShapeDtypeStruct((1, Dp), f32),
            jax.ShapeDtypeStruct((Bsz, d_state, Dp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_tiles, d_state, tile_d), f32),  # λ carry per tile
            pltpu.VMEM((n_tiles, d_state, tile_d), f32),  # gA accumulator
            pltpu.VMEM((n_tiles, tile_d), f32),  # gD accumulator
        ],
        interpret=interpret,
    )(u, dt, dt_next, B, C, gy, A_t, Dv.reshape(1, Dp), h_starts, ghl_t)

    gu = gu[:, :L, :d_inner]
    gdt = gdt[:, :L, :d_inner]
    gB = gB[:, :L]
    gC = gC[:, :L]
    gA = gA_t[:, :d_inner].T
    gDv = gD[0, :d_inner]
    gh0 = gh0[:, :, :d_inner].swapaxes(-1, -2)
    return gu, gdt, gA, gB, gC, (None if D is None else gDv), gh0


# Default time-chunk size for the differentiable path (tuned on v5e).  The
# same nondiff ``chunk`` flows to both the forward and the backward kernel,
# so the forward's saved boundary states always line up with the backward's
# per-chunk adjoint recurrence.
_VJP_CHUNK = 32


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def selective_scan_auto(u, dt, A, B, C, D, h0, chunk=_VJP_CHUNK,
                        interpret=False):
    """Differentiable wrapper: Pallas forward AND backward on TPU.  The
    backward runs the adjoint recurrence as a second Pallas kernel seeded by
    the forward's saved chunk-boundary states (no forward re-run, no AD
    through the associative scan).  ``interpret=True`` runs both kernels in
    Pallas interpret mode (CPU coverage of the TPU code path)."""
    y, h_last = pallas_selective_scan(u, dt, A, B, C, D, h0, chunk=chunk,
                                      interpret=interpret)
    return y, h_last


def _fwd(u, dt, A, B, C, D, h0, chunk, interpret):
    y, h_last, h_starts = pallas_selective_scan(
        u, dt, A, B, C, D, h0, chunk=chunk, return_boundaries=True,
        interpret=interpret,
    )
    return (y, h_last), (u, dt, A, B, C, D, h0, h_starts)


def _bwd(chunk, interpret, res, cts):
    u, dt, A, B, C, D, h0, h_starts = res
    gy, gh_last = cts
    gu, gdt, gA, gB, gC, gD, gh0 = pallas_selective_scan_bwd(
        u, dt, A, B, C, D, h_starts, gy, gh_last, chunk=chunk,
        interpret=interpret,
    )
    return (
        gu.astype(u.dtype), gdt.astype(dt.dtype), gA.astype(A.dtype),
        gB.astype(B.dtype), gC.astype(C.dtype),
        None if gD is None else gD.astype(D.dtype),
        None if h0 is None else gh0.astype(jnp.float32),
    )


selective_scan_auto.defvjp(_fwd, _bwd)
