"""Prune application: functional ``jnp.take`` over every affected leaf.

Replaces the reference's in-place ``prune_parameter_and_grad`` (pruning/
util.py:328-349, which index_select's weight.data, weight.grad and the Adam
exp_avg/exp_avg_sq buffers) with pure pytree transforms over (params, grads,
optimizer state).  Because widths live in tensor shapes, no module metadata
patching is needed (the reference patches in_channels/d_inner/dt_rank/...;
pruninggroup.py:278-296, :340-353).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np
import optax

from cleanumamba_tpu.prune.groups import PruneGroup, Slice, get_path, set_path


def _keep_indices(dim: int, s: Slice, n_channels: int, prune_idxs: Sequence[int]) -> np.ndarray:
    """Indices to KEEP along s.axis given pruned channel ids."""
    drop = set()
    for c in prune_idxs:
        for h in range(s.n_heads):
            drop.add(s.offset + h * n_channels + int(c))
    return np.asarray([i for i in range(dim) if i not in drop], np.int32)


def prune_tree(tree, group: PruneGroup, prune_idxs: Sequence[int]):
    """Apply one group's pruning to a pytree with the same structure as
    params (params themselves, grads, or Adam moment trees)."""
    for s in group.slices:
        leaf = get_path(tree, s.path)
        keep = _keep_indices(leaf.shape[s.axis], s, group.n_channels, prune_idxs)
        leaf = jnp.take(jnp.asarray(leaf), jnp.asarray(keep), axis=s.axis)
        tree = set_path(tree, s.path, leaf)
    return tree


def _map_opt_state(opt_state, fn):
    """Apply fn to every params-shaped subtree inside an optax state."""

    def rec(x):
        if isinstance(x, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=x.count, mu=fn(x.mu), nu=fn(x.nu))
        if isinstance(x, tuple) and hasattr(x, "_fields"):  # other NamedTuples
            return type(x)(*(rec(v) for v in x))
        if isinstance(x, tuple):
            return tuple(rec(v) for v in x)
        return x

    return rec(opt_state)


def apply_pruning(
    params,
    selection: Dict[str, List[int]],
    cfg,
    grads=None,
    opt_state=None,
):
    """Prune all selected groups.  Returns (params, grads, opt_state) with
    non-provided trees returned as None.

    Groups are REBUILT from the current shapes before each group's prune:
    slices of different groups can share a leaf (x_proj carries dt_rank,
    d_state and d_inner dims), so offsets/widths captured earlier go stale
    the moment another group touches that leaf.  Channel indices in
    ``selection`` stay valid because each index is relative to its own
    group's span and no two groups prune the same span.  (This replaces the
    reference's mutable ``next_module_to_offset`` propagation,
    pruninggroup.py:228-233,294-296.)
    """
    from cleanumamba_tpu.prune.groups import build_groups

    for name, idxs in selection.items():
        if not idxs:
            continue
        groups = {g.name: g for g in build_groups(params, cfg)}
        g = groups[name]
        params = prune_tree(params, g, idxs)
        if grads is not None:
            grads = prune_tree(grads, g, idxs)
        if opt_state is not None:
            opt_state = _map_opt_state(
                opt_state, lambda tree, g=g, idxs=idxs: prune_tree(tree, g, idxs)
            )
    return params, grads, opt_state
