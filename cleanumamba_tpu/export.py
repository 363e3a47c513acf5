"""Ahead-of-time serving export: the compiled model as a portable artifact.

The reference's deployment story is "load the torch checkpoint into a live
Python process" (src/denoise.py, src/network/CleanUMamba.py:568-591 streaming
demo).  A TPU-native serving story wants the *computation itself* shipped:
this module serializes the offline forward and the streaming prime/step
functions to StableHLO via ``jax.export`` so a serving process (or a
different host) can run them without the model-definition code — only the
weight pytree and this bundle are needed.

Design choices:

- **Weights stay call arguments**, not baked constants: one artifact serves
  every checkpoint of the same geometry (e.g. finetune refreshes), and the
  artifact stays small.  Ragged pruned checkpoints have their shapes traced
  into the artifact — that is inherent to static-shape XLA serving and is
  exactly how the rest of this framework treats prunedness (shape-derived,
  no metadata).
- **The streaming step is exported stateless**: ``(params, state, samples)
  -> (state', out)`` with the state pytree in the open, so the serving loop
  owns session state and one loaded artifact serves many concurrent streams
  (the long-context invariant: block streaming == N single steps).
- **Platform-honest**: the artifact records the lowering platform.  On CPU
  the scan lowers to pure XLA StableHLO; on TPU the Pallas kernels enter as
  ``tpu_custom_call`` ops (serialized by jax.export's Mosaic support), which
  ties the artifact to a compatible libtpu — recorded in the sidecar.

Bundle layout (a directory)::

    bundle.json      — config fields, jax version, platforms, function table
    offline.shlo     — forward(params, x) for a fixed length
    prime.shlo       — stream_prime(params, frame)
    step.shlo        — stream_step(params, state, new_samples)   (block=N)

Round-trip is exact jit-vs-jit: the deserialized call re-executes the same
StableHLO the jitted live function lowers to (tests/test_export.py asserts
bitwise equality against ``jax.jit`` of the live functions on CPU; eager
execution fuses differently and is not the baseline).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import export as jexport

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward
from cleanumamba_tpu.streaming import stream_prime, stream_step

_BUNDLE_VERSION = 1


def _specs_of(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree
    )


def _export_fn(fn: Callable, *arg_specs) -> jexport.Exported:
    """Export a jitted function, permitting Mosaic custom calls on TPU.

    jax.export refuses custom calls that are not on its stability allowlist;
    the Pallas scan kernels lower to ``tpu_custom_call`` which IS the
    supported Mosaic path, but older jax versions gate it — fall back to an
    explicit opt-in so the export works either way.
    """
    jitted = jax.jit(fn)
    try:
        return jexport.export(jitted)(*arg_specs)
    except ValueError:
        disabled = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        return jexport.export(jitted, disabled_checks=disabled)(*arg_specs)


def export_offline(params, cfg: CleanUMambaConfig, length: int,
                   batch: int = 1) -> jexport.Exported:
    """``forward(params, x)`` for a fixed (batch, length) input."""
    x_spec = jax.ShapeDtypeStruct((batch, length), jnp.float32)
    return _export_fn(lambda p, x: forward(p, x, cfg), _specs_of(params), x_spec)


def export_stream(params, cfg: CleanUMambaConfig, batch: int = 1,
                  block: int = 1):
    """Export (prime, step) for streaming serving.

    prime consumes the first ``frame_length`` raw samples and returns the
    session state; step consumes ``block * total_stride`` new samples and
    returns ``(state', out)``.  block > 1 uses the same single-step export
    applied blockwise by the caller — the step function itself is exported
    at the requested block granularity via vectorized new_samples width.
    """
    p_spec = _specs_of(params)
    frame_spec = jax.ShapeDtypeStruct((batch, cfg.frame_length), jnp.float32)

    def prime_fn(p, f):
        return stream_prime(p, cfg, f)

    prime_exp = _export_fn(prime_fn, p_spec, frame_spec)

    # state template from the prime signature (shapes only, no compute)
    state_spec, _ = jax.eval_shape(prime_fn, p_spec, frame_spec)

    if block == 1:
        def step_fn(p, s, new):
            return stream_step(p, cfg, s, new)
        new_spec = jax.ShapeDtypeStruct((batch, cfg.total_stride), jnp.float32)
    else:
        from cleanumamba_tpu.streaming import stream_step_block

        def step_fn(p, s, new):
            return stream_step_block(p, cfg, s, new)
        new_spec = jax.ShapeDtypeStruct(
            (batch, block * cfg.total_stride), jnp.float32)

    step_exp = _export_fn(step_fn, p_spec, state_spec, new_spec)
    return prime_exp, step_exp


def save_bundle(path: str, cfg: CleanUMambaConfig,
                exported: Dict[str, jexport.Exported],
                extra_meta: Optional[Dict[str, Any]] = None) -> None:
    """Write a bundle directory: one .shlo per function + bundle.json."""
    os.makedirs(path, exist_ok=True)
    table = {}
    for name, exp in exported.items():
        fname = f"{name}.shlo"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(exp.serialize())
        table[name] = {
            "file": fname,
            "platforms": list(exp.platforms),
            "in_avals": [str(a) for a in exp.in_avals],
        }
    meta = {
        "bundle_version": _BUNDLE_VERSION,
        "jax_version": jax.__version__,
        "config": dataclasses.asdict(cfg),
        "functions": table,
    }
    # batch/block are part of the bundle schema proper (not CLI-only
    # metadata): serve.SessionMultiplexer.from_bundle sizes its slot pool
    # from them.  Derived from the traced input shapes — the LAST flattened
    # input aval of each function is its raw-audio argument (params/state
    # pytree leaves flatten first): step's new_samples is
    # (batch, block * total_stride); prime's frame and offline's x carry
    # batch only.
    for name in ("step", "prime", "offline"):
        if name in exported:
            b, width = exported[name].in_avals[-1].shape
            meta["batch"] = int(b)
            if name == "step":
                meta["block"] = int(width) // cfg.total_stride
            break
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "bundle.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_bundle(path: str):
    """Load a bundle: returns (cfg, {name: callable}).

    The callables take the same (pytree) arguments the exporting functions
    were traced with — e.g. ``fns["step"](params, state, new_samples)``.
    No model-definition code runs; jax re-executes the serialized StableHLO.
    """
    with open(os.path.join(path, "bundle.json")) as f:
        meta = json.load(f)
    if meta["bundle_version"] != _BUNDLE_VERSION:
        raise ValueError(f"unsupported bundle version {meta['bundle_version']}")
    cfg = CleanUMambaConfig(**meta["config"])
    fns = {}
    for name, entry in meta["functions"].items():
        with open(os.path.join(path, entry["file"]), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        fns[name] = exp.call
    return cfg, fns
