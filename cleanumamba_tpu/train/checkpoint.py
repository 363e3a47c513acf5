"""Checkpoint save/load.

Format parity with the reference's three checkpoint flavours (survey §5):
training ckpts are ``{n_iter}.pkl`` dicts carrying iter/run_id/
network_config/model/optimizer state (train.py:362-371), discovered via
``find_max_epoch`` (util.py:26-45).  Here the payload is a pickled pytree of
numpy arrays (framework-neutral; no torch dependency), and pruned models are
saved the same way — ragged shapes are just differently-shaped leaves plus
the (possibly stale) original network_config, exactly like the released
reference pickles.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

from cleanumamba_tpu.config import CleanUMambaConfig


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def find_max_epoch(path: str) -> int:
    """Latest ``{n}.pkl`` iteration in a directory, -1 if none
    (reference util.py:26-45)."""
    if not os.path.isdir(path):
        return -1
    epoch = -1
    for f in os.listdir(path):
        if f.endswith(".pkl"):
            try:
                epoch = max(epoch, int(f[:-4]))
            except ValueError:
                continue
    return epoch


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    cfg: Optional[CleanUMambaConfig] = None,
    run_id: Optional[str] = None,
    training_time_seconds: float = 0.0,
    extra: Optional[dict] = None,
) -> str:
    os.makedirs(directory, exist_ok=True)
    payload = {
        "iter": step,
        "run_id": run_id,
        "network_config": cfg.to_reference_json() if cfg is not None else None,
        "bottleneck": cfg.bottleneck if cfg is not None else None,
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "training_time_seconds": training_time_seconds,
    }
    if extra:
        payload.update(extra)
    path = os.path.join(directory, f"{step}.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("network_config") is not None:
        network = "CleanUNet" if payload.get("bottleneck") == "mha" else "CleanUMamba"
        ncfg = dict(payload["network_config"])
        if payload.get("bottleneck") == "lstm":
            ncfg["LSTM"] = True
        elif payload.get("bottleneck") == "mamba_s4":
            ncfg["mamba_s4"] = True
        elif payload.get("bottleneck") == "mamba2":
            ncfg["mamba_v2"] = True
        payload["config"] = CleanUMambaConfig.from_reference_json(network, ncfg)
    return payload


def load_latest(directory: str) -> Optional[dict]:
    step = find_max_epoch(directory)
    if step < 0:
        return None
    return load_checkpoint(os.path.join(directory, f"{step}.pkl"))
