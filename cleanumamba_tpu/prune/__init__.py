"""Structured channel pruning: dependency groups over the param pytree.

Functional redesign of the reference pruning framework
(/root/reference/src/pruning/): groups are *rebuilt from parameter shapes* on
demand instead of carrying mutable channel_offset/dim state, pruning is a
pytree -> pytree transformation (``jnp.take`` on every affected leaf plus the
Adam moments), and activation telemetry comes from a tap-collecting forward
instead of module hooks.  Recompilation happens naturally at prune events
(rare: every few hundred steps), keeping shapes static in between —
survey §7 "Prune-step recompilation cost".
"""

from cleanumamba_tpu.prune.groups import Slice, PruneGroup, build_groups
from cleanumamba_tpu.prune.importance import (
    calc_importance,
    group_importances,
    get_prune_channels,
)
from cleanumamba_tpu.prune.pruner import prune_tree, apply_pruning

__all__ = [
    "Slice",
    "PruneGroup",
    "build_groups",
    "calc_importance",
    "group_importances",
    "get_prune_channels",
    "prune_tree",
    "apply_pruning",
]
