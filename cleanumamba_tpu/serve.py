"""Concurrent-session streaming service: N sessions, ONE compiled step.

The reference serves one stream per Python process (streaming demo,
src/examples/streaming_demo.py; src/network/CleanUMamba.py:358-418 feed/
flush).  On TPU the single-frame step is weight-bandwidth/dispatch-bound
(docs/performance.md: the compute is a rounding error next to streaming the
weights from HBM), so the idiomatic serving shape is to BATCH concurrent
sessions: the weights are read from HBM once per tick regardless of the
batch size, and the per-session cost falls with batch.  Measured on-chip
(E8-full bf16, block 16, `scripts/bench_serve_scaling.py`, 2026-08-20):
per-session cost 0.0143 ms/frame at batch 1 -> 0.0055 ms/frame at batch 8;
aggregate 1121 -> 2934 audio-s/s — one chip sustains ~2900 concurrent
real-time streams at 256 ms chunk latency.  (Getting there required the
Pallas scan dispatch in streaming._bottleneck_tokens: the first batch-8
probe measured a 9.9 ms tick because the XLA chunked scan's fp32
coefficient tensors fall out of fusion at serving batch — full table in
docs/performance.md, serving section.)  This module multiplexes up
to ``slots`` independent denoise sessions through one jitted (or
ahead-of-time exported — export.py) batched prime/step pair.

Design:

- **The state pool is one batched pytree.**  Every streaming-state leaf is
  batch-leading (streaming.py keeps even the normalization EMA frame
  counter per-session, (B, 1)), so admitting a session is one
  ``tree_map(lambda pool, one: pool.at[slot].set(one[slot]))`` splice and
  no recompilation ever happens after warmup — session churn is pure
  device-side indexing.
- **Sessions are mutually exact.**  Every op in prime/step is
  batch-parallel, so a session multiplexed alongside arbitrary other
  traffic produces the same audio as the same session streamed alone
  (tests/test_serve.py pins this, staggered joins included).
- **Ticks never block on a starved session.**  Each tick consumes
  ``block * total_stride`` buffered samples from every session that has
  them; sessions that don't simply don't advance: their rows ride the
  batched step on zeros, their output rows are discarded, and their state
  rows are restored from the pre-tick pool afterwards — free, because JAX
  arrays are immutable, so "the pool before the step" is just a retained
  reference.  When every session is fed at wire rate (the steady serving
  state) no restore happens and the tick is one step call.  Empty slots
  ride along on zeros and their output is discarded.
- **Artifact-driven.**  ``SessionMultiplexer.from_bundle`` serves from an
  exported StableHLO bundle (export.py) — no model code in the serving
  process; the live-function constructor is the development path.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.streaming import (
    prepare_weight_view,
    stream_prime,
    stream_step,
    stream_step_block,
)


class SessionMultiplexer:
    """Serve up to ``slots`` concurrent denoise sessions from one model.

    slots:  batch width of the compiled functions (fixed at construction —
            static shapes; pick it for the expected peak concurrency).
    block:  frames per tick.  1 = lowest latency; larger blocks trade
            latency for throughput exactly like Streamer's block path.
    fns:    optional ``{"prime": f, "step": g}`` overriding the jitted live
            functions — e.g. the callables of an exported bundle whose
            traced batch/block match (see :meth:`from_bundle`).
    weights: "fp32" | "bf16" | "int8" storage precision (see
            streaming.prepare_weight_view); ignored when ``fns`` is given.
    """

    def __init__(self, params, cfg: CleanUMambaConfig, slots: int = 8,
                 block: int = 1, dtype=jnp.float32, weights: str = "fp32",
                 fns: Optional[Dict[str, Callable]] = None):
        if slots < 1 or block < 1:
            raise ValueError("slots and block must be >= 1")
        self.cfg = cfg
        self.slots = slots
        self.block = block
        self.tick_samples = block * cfg.total_stride
        if fns is not None:
            self.params = params
            self._prime = fns["prime"]
            self._step = fns["step"]
        else:
            self.params, view = prepare_weight_view(params, weights, dtype)
            self._prime = jax.jit(
                lambda p, f: stream_prime(view(p), cfg, f, dtype))
            if block == 1:
                self._step = jax.jit(
                    lambda p, s, n: stream_step(view(p), cfg, s, n, dtype))
            else:
                self._step = jax.jit(
                    lambda p, s, n: stream_step_block(view(p), cfg, s, n, dtype))
        self.pool = None  # batched state pytree, created on first admit
        # host-side per-slot bookkeeping
        self._open = [False] * slots
        self._primed = [False] * slots
        self._buf: List[np.ndarray] = [np.zeros(0, np.float32)] * slots
        self._out: List[List[np.ndarray]] = [[] for _ in range(slots)]
        self._fed = [0] * slots
        self._emitted = [0] * slots
        self.ticks = 0

    # -- session lifecycle --------------------------------------------------

    def open(self) -> int:
        """Reserve a free slot; returns the session id (its slot index)."""
        for sid in range(self.slots):
            if not self._open[sid]:
                self._open[sid] = True
                self._primed[sid] = False
                self._buf[sid] = np.zeros(0, np.float32)
                self._out[sid] = []
                self._fed[sid] = 0
                self._emitted[sid] = 0
                return sid
        raise RuntimeError(f"all {self.slots} slots busy")

    def close(self, sid: int) -> None:
        """Release a slot.  Its state rows become don't-care garbage that
        future ticks step over zeros (finite by construction) until the
        slot is re-admitted, at which point the splice overwrites them."""
        self._check(sid)
        self._open[sid] = False
        self._primed[sid] = False
        self._buf[sid] = np.zeros(0, np.float32)
        self._out[sid] = []

    def feed(self, sid: int, samples: np.ndarray) -> np.ndarray:
        """Buffer raw samples for session ``sid``, advance the pool as far
        as the barrier allows, and return this session's denoised samples
        produced so far (possibly empty — output lags input by the model's
        lookahead, exactly as in Streamer)."""
        self._check(sid)
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf[sid] = np.concatenate([self._buf[sid], samples])
        self._fed[sid] += samples.shape[0]
        self._pump()
        return self._drain(sid)

    def flush(self, sid: int) -> np.ndarray:
        """Zero-pad session ``sid`` until its whole input has been emitted
        (Streamer.flush semantics), trimmed to the fed length.  Terminal:
        close the session afterwards.  Other sessions are unaffected —
        starved ones pause, fed ones advance alongside the pad ticks."""
        self._check(sid)
        want = self._fed[sid] - self._emitted[sid] - self._pending_out(sid)
        if want > 0:
            pad = self.cfg.frame_length + self.tick_samples
            self._buf[sid] = np.concatenate(
                [self._buf[sid], np.zeros(pad, np.float32)])
            self._pump()
        out = self._drain(sid)
        keep = self._fed[sid] - self._emitted[sid] + out.shape[0]
        if keep < out.shape[0]:
            out = out[:max(0, keep)]
            self._emitted[sid] = self._fed[sid]
        return out

    # -- internals ----------------------------------------------------------

    def _check(self, sid: int) -> None:
        if not (0 <= sid < self.slots and self._open[sid]):
            raise ValueError(f"session {sid} is not open")

    def _pending_out(self, sid: int) -> int:
        return sum(o.shape[0] for o in self._out[sid])

    def _drain(self, sid: int) -> np.ndarray:
        outs = self._out[sid]
        self._out[sid] = []
        if not outs:
            return np.zeros(0, np.float32)
        out = np.concatenate(outs)
        self._emitted[sid] += out.shape[0]
        return out

    def _admit_ready(self) -> None:
        """Prime every buffering session that has a full first frame."""
        fl, ts = self.cfg.frame_length, self.cfg.total_stride
        for sid in range(self.slots):
            if not (self._open[sid] and not self._primed[sid]
                    and self._buf[sid].shape[0] >= fl):
                continue
            frames = np.zeros((self.slots, fl), np.float32)
            frames[sid] = self._buf[sid][:fl]
            self._buf[sid] = self._buf[sid][fl:]
            state, out = self._prime(self.params, jnp.asarray(frames))
            if self.pool is None:
                self.pool = state
            else:
                # batch-leading invariant: one splice admits the session
                self.pool = jax.tree_util.tree_map(
                    lambda pool, one: pool.at[sid].set(one[sid]),
                    self.pool, state)
            self._out[sid].append(np.asarray(out[sid]))
            self._primed[sid] = True

    def _pump(self) -> None:
        self._admit_ready()
        tick = self.tick_samples
        while True:
            ready = [s for s in range(self.slots)
                     if self._primed[s] and self._buf[s].shape[0] >= tick]
            if not ready:
                return
            # primed-but-starved sessions must not advance: their rows ride
            # the step on zeros and are rolled back afterwards (the pre-tick
            # pool is an immutable pytree — retaining it IS the snapshot)
            paused = [s for s in range(self.slots)
                      if self._primed[s] and s not in ready]
            before = self.pool
            new = np.zeros((self.slots, tick), np.float32)
            for s in ready:
                new[s] = self._buf[s][:tick]
                self._buf[s] = self._buf[s][tick:]
            self.pool, out = self._step(self.params, self.pool,
                                        jnp.asarray(new))
            if paused:
                idx = jnp.asarray(paused)
                self.pool = jax.tree_util.tree_map(
                    lambda post, pre: post.at[idx].set(pre[idx]),
                    self.pool, before)
            out = np.asarray(out)
            for s in ready:
                self._out[s].append(out[s])
            self.ticks += 1
            self._admit_ready()

    # -- constructors ---------------------------------------------------

    @classmethod
    def from_bundle(cls, path: str, params) -> "SessionMultiplexer":
        """Serve from an exported StableHLO bundle (export.py).  The bundle's
        traced batch becomes ``slots`` and its traced step width ``block``;
        ``params`` is the weight pytree of the matching geometry."""
        from cleanumamba_tpu.export import load_bundle

        cfg, fns = load_bundle(path)
        import json
        import os

        meta = json.load(open(os.path.join(path, "bundle.json")))
        if "batch" not in meta or "block" not in meta:
            raise ValueError(
                f"{path}/bundle.json lacks batch/block — re-export with the "
                "current export.save_bundle (they are schema fields derived "
                "from the traced shapes)")
        return cls(params, cfg, slots=meta["batch"], block=meta["block"],
                   fns={"prime": fns["prime"], "step": fns["step"]})
