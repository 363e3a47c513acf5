"""Knowledge distillation over skip connections.

The reference's loss supports KD (util.py:215-327: student skip -> 1x1
projection + BN, teacher skip -> BN, log(sum |diff|^4) per connection,
following Miles & Mikolajczyk 2023), but the student-teacher driver
(train_student_teacher.py) is not shipped in the repo.  This module supplies
the missing pieces: adapter construction and a jitted KD train step.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig
from cleanumamba_tpu.losses import loss_fn
from cleanumamba_tpu.models.cleanumamba import forward


def skip_widths(cfg: CleanUMambaConfig) -> List[int]:
    """Channel widths of the skip activations returned by
    forward(..., return_skips=True): deepest-first encoder outputs + tsfm_out."""
    widths = cfg.encoder_widths()[::-1]
    return widths + [cfg.tsfm_d_model]


def make_kd_adapters(key, student_cfg: CleanUMambaConfig,
                     teacher_cfg: CleanUMambaConfig, dtype=jnp.float32):
    """One adapter per skip connection: student 1x1 projection to the teacher
    width + per-side batch-norm affine params."""
    s_w = skip_widths(student_cfg)
    t_w = skip_widths(teacher_cfg)
    assert len(s_w) == len(t_w)
    adapters = []
    for i, (sw, tw) in enumerate(zip(s_w, t_w)):
        k = jax.random.fold_in(key, i)
        bound = 1.0 / math.sqrt(sw)
        adapters.append(
            {
                "embed_w": jax.random.uniform(k, (sw, tw), dtype, -bound, bound),
                "embed_b": jnp.zeros((tw,), dtype),
                "bn_s": {"scale": jnp.ones((tw,), dtype), "bias": jnp.zeros((tw,), dtype)},
                "bn_t": {"scale": jnp.ones((tw,), dtype), "bias": jnp.zeros((tw,), dtype)},
            }
        )
    return adapters


def make_kd_train_step(student_cfg: CleanUMambaConfig,
                       teacher_cfg: CleanUMambaConfig,
                       loss_cfg: LossConfig, optimizer, bf16: bool = False):
    """Train step optimising (student params, adapters) against a frozen
    teacher.  batch: (clean, noisy) each (B, L)."""

    def compute(trainable, teacher_params, clean, noisy):
        params, adapters = trainable
        p = params
        if bf16:
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p
            )
        denoised, skips = forward(p, noisy, student_cfg, return_skips=True)
        _, teacher_skips = forward(teacher_params, noisy, teacher_cfg, return_skips=True)
        teacher_skips = [jax.lax.stop_gradient(t) for t in teacher_skips]
        # skip lengths can differ by padding granularity; crop to match
        pairs = [
            (s[:, : min(s.shape[1], t.shape[1])], t[:, : min(s.shape[1], t.shape[1])])
            for s, t in zip(skips, teacher_skips)
        ]
        loss, aux = loss_fn(
            denoised.astype(jnp.float32), clean.astype(jnp.float32), loss_cfg,
            skips=[s.astype(jnp.float32) for s, _ in pairs],
            teacher_skips=[t.astype(jnp.float32) for _, t in pairs],
            kd_adapters=adapters,
        )
        return loss, aux

    grad_fn = jax.value_and_grad(compute, has_aux=True)

    def step(params, adapters, opt_state, teacher_params, batch):
        clean, noisy = batch
        (loss, aux), grads = grad_fn((params, adapters), teacher_params, clean, noisy)
        updates, opt_state = optimizer.update(grads, opt_state, (params, adapters))
        import optax

        params, adapters = optax.apply_updates((params, adapters), updates)
        return params, adapters, opt_state, aux

    return step
