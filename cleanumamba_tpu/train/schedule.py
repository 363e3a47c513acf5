"""Linear-warmup + cosine-decay LR schedule.

Value-parity with the reference's ``LinearWarmupCosineDecay``
(/root/reference/src/util/util.py:115-161): phase 1 anneals linearly from
``lr_max/divider`` to ``lr_max`` over ``warmup_proportion * n_iter`` steps;
phase 2 anneals cosine from ``lr_max`` down to ``lr_min / 1e4``.  The
reference's ``Phase.step()`` increments its counter *before* evaluating, so
the value applied at optimiser step ``i`` (0-based) corresponds to proportion
``(i+1)/phase_len`` — replicated here.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_cosine_decay(
    lr_max: float,
    n_iter: int,
    divider: float = 25.0,
    warmup_proportion: float = 0.05,
):
    """Returns an optax-style schedule fn step -> lr."""
    phase1 = int(n_iter * warmup_proportion)
    phase2 = n_iter - phase1
    lr_min = lr_max / divider
    lr_final = lr_min / 1e4

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip((step + 1.0) / max(phase1, 1), 0.0, 1.0)
        warm = lr_min + p1 * (lr_max - lr_min)
        p2 = jnp.clip((step + 1.0 - phase1) / max(phase2, 1), 0.0, 1.0)
        cos_val = jnp.cos(jnp.pi * p2) + 1.0
        decay = lr_final + (lr_max - lr_final) / 2.0 * cos_val
        return jnp.where(step < phase1, warm, decay)

    return schedule
