"""Framework utilities: param/MAC accounting and metrics logging.

Replaces the reference's torchinfo ``summary`` / torchprofile
``profile_macs`` accounting (survey N11; reference train.py:106-120,
pruning/util.py:128-133) with XLA cost analysis, and wandb-only logging
(reference train.py:200-211) with a JSONL file + optional wandb mirror.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def count_parameters(params) -> int:
    return sum(
        int(x.size)
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )


def count_macs(fn, *example_args) -> Optional[int]:
    """Multiply-accumulate count of a jitted function via XLA cost analysis
    (flops / 2).  Returns None when the backend reports no analysis."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = analysis.get("flops") if analysis else None
        if flops:
            return int(flops) // 2
    except Exception:
        pass
    # fallback: analyse without compiling (works on CPU backends)
    try:
        analysis = jax.jit(fn).lower(*example_args).cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = analysis.get("flops") if analysis else None
        if flops:
            return int(flops) // 2
    except Exception:
        return None
    return None


def model_macs(params, cfg, seconds: float = 1.0, sample_rate: int = 16000) -> Optional[int]:
    """MACs for denoising ``seconds`` of audio (reference reports MACs per
    1 s input, train.py:106: input_size=(1,1,16000))."""
    from cleanumamba_tpu.models.cleanumamba import forward

    L = int(seconds * sample_rate)
    x = jnp.zeros((1, L), jnp.float32)
    return count_macs(lambda p, x: forward(p, x, cfg, scan_impl="xla"), params, x)


class MetricsLogger:
    """JSONL metrics log (one object per line, wall-clock stamped) with an
    optional wandb mirror when the package + login are available."""

    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_project: str = "cleanumamba-tpu", run_id: Optional[str] = None,
                 config: Optional[dict] = None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        self._wandb = None
        self.run_id = run_id
        if use_wandb:
            try:  # pragma: no cover - wandb not in the image
                import wandb

                run = wandb.init(project=wandb_project, id=run_id,
                                 resume="must" if run_id else None, config=config)
                self._wandb = wandb
                self.run_id = run.id
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {"t": time.time()}
        if step is not None:
            rec["step"] = step
        rec.update({k: _scalar(v) for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
