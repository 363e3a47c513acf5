"""Layer-wise loss calibration of group importances.

Reference: src/pruning/layerwise_calibration.py:23-151.  For each group,
prune 20% of its channels (least important by ``n_parameters*metric``) on a
*copy*, measure the loss change over a fixed batch sample, and set
``scale = loss_change / total_pruned_importance``; scales are EMA'd across
calibrations and floored at ``min_scale``.  The functional pytree design
makes the "copy" free — pruning returns a new tree, the original is untouched
(no deepcopy / hook-removal dance, layerwise_calibration.py:118-121).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np

from cleanumamba_tpu.prune.groups import PruneGroup
from cleanumamba_tpu.prune.importance import get_prune_channels
from cleanumamba_tpu.prune.pruner import apply_pruning


class Calibrator:
    def __init__(self, ema_factor: float = 1.0, min_scale: float = 1e-7,
                 default_scale: float = 36.0):
        self.scales: Dict[str, float] = {}
        self.ema_factor = ema_factor
        self.min_scale = min_scale
        self.default_scale = default_scale

    def gather(
        self,
        params,
        cfg,
        grads,
        groups: Sequence[PruneGroup],
        loss_sampler: Callable,
        importance_metric: str,
        prune_fraction: float = 0.2,
    ):
        """loss_sampler(params) -> mean loss over a fixed data sample."""
        baseline = float(loss_sampler(params))
        new_scales: Dict[str, float] = {}
        metric = f"n_parameters*{importance_metric}"
        for g in groups:
            sel, _, _ = get_prune_channels(
                [g], params, grads, metric,
                n_prune_channels=None,
                perc_prune_channels_per_iter=prune_fraction,
                min_channels_per_group=8,
            )
            idxs = sel.get(g.name, [])
            if not idxs:
                continue
            # total importance of the selected channels
            from cleanumamba_tpu.prune.importance import calc_importance, group_importances

            imps = group_importances(params, g, grads)
            vec = np.asarray(calc_importance(imps, metric), dtype=np.float64)
            total_importance = float(vec[idxs].sum())
            if total_importance <= 0:
                continue
            pruned, _, _ = apply_pruning(params, {g.name: idxs}, cfg)
            loss = float(loss_sampler(pruned))
            new_scales[g.name] = (loss - baseline) / total_importance
        for name, scale in new_scales.items():
            if name in self.scales:
                self.scales[name] = max(
                    self.scales[name] * (1 - self.ema_factor) + scale * self.ema_factor,
                    self.min_scale,
                )
            else:
                self.scales[name] = max(scale, self.min_scale)
        return new_scales

    def as_dict(self) -> Dict[str, float]:
        return dict(self.scales)

    def scale_for(self, name: str) -> float:
        return self.scales.get(name, self.default_scale)
