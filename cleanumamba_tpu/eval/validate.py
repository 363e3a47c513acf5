"""Validation loop over a paired test set (reference denoise_eval.py:22-117).

Runs offline denoising on each utterance, converts to int16 scale before
metric computation (the reference's quirk, denoise_eval.py:99-100 — PESQ/STOI
are computed on int16-scaled arrays), and accumulates *length-weighted*
metric means (:111-115).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.eval.metrics import eval_waveform
from cleanumamba_tpu.models.cleanumamba import forward


def validate(
    params,
    cfg: CleanUMambaConfig,
    dataset,
    max_items: Optional[int] = None,
    pad_to: Optional[int] = None,
    verbose: bool = False,
    mesh=None,
) -> Dict[str, float]:
    """Length-weighted mean metrics over (clean, noisy) pairs.

    pad_to: pad/crop utterances to a fixed length to avoid one XLA
    recompilation per distinct length (recommended on TPU).
    mesh: optional 1-D device mesh — utterances are batched and sharded over
    the 'data' axis for multi-chip evaluation (requires pad_to).
    """
    if mesh is not None:
        assert pad_to is not None, "sharded eval needs fixed lengths (pad_to)"
        return _validate_sharded(params, cfg, dataset, max_items, pad_to, verbose, mesh)
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))
    totals: Dict[str, float] = {}
    weight_sum = 0.0
    n = len(dataset) if max_items is None else min(max_items, len(dataset))
    for i in range(n):
        clean, noisy = dataset[i][0], dataset[i][1]
        L = len(noisy)
        x = noisy
        if pad_to is not None:
            if L < pad_to:
                x = np.pad(noisy, (0, pad_to - L))
            else:
                x = noisy[:pad_to]
                L = pad_to
        den = np.asarray(fwd(params, jnp.asarray(x[None], jnp.float32)))[0][:L]
        # int16 scaling before metrics (reference denoise_eval.py:99-100)
        c16 = np.clip(clean[:L] * 32768.0, -32768, 32767)
        d16 = np.clip(den * 32768.0, -32768, 32767)
        metrics = eval_waveform(c16, d16)
        w = float(L)
        for k, v in metrics.items():
            if v is None or not np.isfinite(v):
                continue
            totals[k] = totals.get(k, 0.0) + v * w
        weight_sum += w
        if verbose:
            print(f"[{i+1}/{n}] " + " ".join(
                f"{k}={v:.3f}" for k, v in metrics.items() if v is not None
            ))
    return {k: v / weight_sum for k, v in totals.items()}


def _validate_sharded(params, cfg, dataset, max_items, pad_to, verbose, mesh):
    """Batch-sharded eval: device-parallel forwards, host-side metrics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = int(np.prod(mesh.devices.shape))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    fwd = jax.jit(
        lambda p, x: forward(p, x, cfg), in_shardings=(repl, shard),
        out_shardings=shard,
    )
    n = len(dataset) if max_items is None else min(max_items, len(dataset))
    items = []
    for i in range(n):
        clean, noisy = dataset[i][0], dataset[i][1]
        L = min(len(noisy), pad_to)
        items.append((np.pad(clean[:L], (0, pad_to - L)),
                      np.pad(noisy[:L], (0, pad_to - L)), L))
    totals: Dict[str, float] = {}
    weight_sum = 0.0
    with mesh:
        for s in range(0, len(items), n_dev):
            chunk = items[s : s + n_dev]
            real = len(chunk)
            while len(chunk) < n_dev:  # pad the final batch
                chunk = chunk + [chunk[-1]]
            noisy_b = jnp.asarray(np.stack([c[1] for c in chunk]), jnp.float32)
            den = np.asarray(fwd(params, noisy_b))
            for k in range(real):
                clean, _, L = chunk[k]
                c16 = np.clip(clean[:L] * 32768.0, -32768, 32767)
                d16 = np.clip(den[k][:L] * 32768.0, -32768, 32767)
                metrics = eval_waveform(c16, d16)
                for key, v in metrics.items():
                    if v is None or not np.isfinite(v):
                        continue
                    totals[key] = totals.get(key, 0.0) + v * float(L)
                weight_sum += float(L)
    return {k: v / weight_sum for k, v in totals.items()}
