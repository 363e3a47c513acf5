"""Training: optimiser construction + jitted data-parallel train step.

Parity with the reference driver (/root/reference/src/training/train.py):
- Adam (all-param weight decay as L2-into-grad) or AdamW with decay applied
  only to dim>=2 params (train.py:129-152, nanoGPT-style split :133-138);
- grad-norm clipping (clip_grad_norm_max, :303-309);
- gradient accumulation ``batch_size_total / (per_device * n_devices)``
  (:232-233) — here a ``lax.scan`` over micro-batches inside one jitted step;
- mixed precision: TPU bf16 compute with fp32 master params replaces
  AMP+GradScaler (train.py:156-160); bf16 needs no loss scaling (survey N8).

Distribution: batch sharded over a 1-D mesh, params replicated; XLA emits
the gradient all-reduce over ICI (replaces train_distributed.py:97-149).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cleanumamba_tpu.config import (
    CleanUMambaConfig,
    LossConfig,
    OptimizationConfig,
)
from cleanumamba_tpu.losses import loss_fn
from cleanumamba_tpu.models.cleanumamba import forward
from cleanumamba_tpu.train.schedule import linear_warmup_cosine_decay


def make_optimizer(opt_cfg: OptimizationConfig, schedule=None) -> optax.GradientTransformation:
    if schedule is None:
        schedule = linear_warmup_cosine_decay(opt_cfg.learning_rate, opt_cfg.n_iters)
    b1, b2 = opt_cfg.betas
    chain = [optax.clip_by_global_norm(opt_cfg.clip_grad_norm_max)]
    if opt_cfg.optimizer == "adam":
        # torch Adam applies weight_decay as L2 added to the gradient
        if opt_cfg.weight_decay:
            chain.append(optax.add_decayed_weights(opt_cfg.weight_decay))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=opt_cfg.eps))
    elif opt_cfg.optimizer == "adamw":
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=opt_cfg.eps))
        if opt_cfg.weight_decay:
            # decoupled decay only on dim>=2 tensors (train.py:133-138)
            chain.append(
                optax.add_decayed_weights(
                    opt_cfg.weight_decay,
                    mask=lambda params: jax.tree_util.tree_map(
                        lambda p: p.ndim >= 2, params
                    ),
                )
            )
    else:
        raise ValueError(opt_cfg.optimizer)
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def make_train_step(
    model_cfg: CleanUMambaConfig,
    loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation,
    bf16: bool = True,
    scan_chunk: int = 32,
    skip_nonfinite_updates: bool = False,
    axis_name: Optional[str] = None,
    remat: bool = False,
) -> Callable:
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, aux).

    batch: (clean, noisy) each (accum, B, L) — the leading axis is scanned
    for gradient accumulation (pass accum=1 for plain steps).

    aux["grads_finite"] reports gradient health every step (the anomaly
    signal the reference gets from torch's detect_anomaly, train.py:427);
    with skip_nonfinite_updates=True a non-finite step leaves params and
    optimizer state untouched instead of poisoning them.

    axis_name: set (e.g. "data") when the step will run under
    :func:`shard_train_step`'s shard_map — gradients and scalar aux are
    pmean'd over that mesh axis before the optimizer update, so every
    device applies the identical update to its replicated params.
    """

    def micro_loss(params, clean, noisy):
        p = params
        if bf16:
            # cast params AND input: activations follow the input dtype, and
            # at L=160k the (B, L, C) encoder/decoder activations dominate
            # HBM traffic — weights-only bf16 leaves them fp32 (mixed-dtype
            # matmuls promote).  Scan state and the loss stay fp32.
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                params,
            )
            noisy = noisy.astype(jnp.bfloat16)
        if remat:
            fwd = jax.checkpoint(
                lambda pp, nn: forward(pp, nn, model_cfg, chunk=scan_chunk)
            )
        else:
            fwd = lambda pp, nn: forward(pp, nn, model_cfg, chunk=scan_chunk)  # noqa: E731
        denoised = fwd(p, noisy)
        loss, aux = loss_fn(denoised.astype(jnp.float32), clean.astype(jnp.float32), loss_cfg)
        return loss, aux

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(params, opt_state, batch):
        clean, noisy = batch

        def micro(acc, xs):
            c, n = xs
            (_, aux), grads = grad_fn(params, c, n)  # loss rides in aux["loss"]
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, aux

        zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        grads, auxs = jax.lax.scan(micro, zero, (clean, noisy))
        n_micro = clean.shape[0]
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            auxs = jax.lax.pmean(auxs, axis_name)
        grad_norm = optax.global_norm(grads)
        grads_finite = jnp.isfinite(grad_norm)  # norm propagates any nan/inf
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if skip_nonfinite_updates:
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(grads_finite, new, old), new_params, params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(grads_finite, new, old)
                if hasattr(new, "shape") else new,
                new_opt_state, opt_state,
            )
        aux = {k: jnp.mean(v) for k, v in auxs.items()}
        aux["grad_norm"] = grad_norm
        aux["grads_finite"] = grads_finite
        return new_params, new_opt_state, aux

    return train_step


def make_device_data_steps(step_fn, batch: int, length: int, k_steps: int,
                           accum: int = 1, sr: int = 16000,
                           snr=(0.0, 15.0), mesh: Optional[Mesh] = None,
                           axis_name: str = "data") -> Callable:
    """Fuse K whole train steps into ONE device dispatch, with every batch
    synthesized ON DEVICE (data/synth_device.py) from a folded PRNG key.

    Through this environment's tunnelled TPU, the per-step host->device
    batch transfer (~5 MB for batch 2 x 10 s) costs ~10x the 30 ms compute
    of the step itself; host-side data generation is cheap (~17 ms) but
    shipping it is not.  Scanning the step over on-device-generated batches
    removes the traffic entirely and amortises the dispatch round-trip over
    ``k_steps`` iterations — the synthetic-data equivalent of an on-device
    input pipeline.  No reference counterpart (its data path is a torch
    DataLoader over wav files, src/dataset.py); real DNS/VCTK material
    keeps the host loader.

    ``step_fn`` must be the UNJITTED callable from :func:`make_train_step`.
    Returns stepper(params, opt_state, key) -> (params, opt_state, aux) —
    jitted, params/opt_state donated, aux from the LAST of the K steps
    (matching what per-iter logging would have printed).

    Multi-chip: pass ``mesh`` (and build ``step_fn`` with the matching
    ``axis_name`` so its gradients pmean in-step).  The whole K-step scan
    runs under ``shard_map`` with params replicated; each device folds its
    ``axis_index`` into the batch key and synthesizes its LOCAL ``batch``
    items on itself — data-parallel training with no data movement at all,
    host or ICI (only the gradient pmean rides the interconnect).
    """
    from cleanumamba_tpu.data.synth_device import synth_batch

    def body(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        if mesh is not None:
            sub = jax.random.fold_in(sub, jax.lax.axis_index(axis_name))
        clean, noisy = synth_batch(sub, batch * accum, length, sr,
                                   float(snr[0]), float(snr[1]))
        shape = (accum, batch, length)
        params, opt_state, aux = step_fn(
            params, opt_state, (clean.reshape(shape), noisy.reshape(shape)))
        return (params, opt_state, key), aux

    def stepper(params, opt_state, key):
        (params, opt_state, _), auxs = jax.lax.scan(
            body, (params, opt_state, key), None, length=k_steps)
        aux = {k: v[-1] for k, v in auxs.items()}
        return params, opt_state, aux

    if mesh is not None:
        from jax.experimental.shard_map import shard_map

        stepper = shard_map(stepper, mesh=mesh,
                            in_specs=(P(), P(), P()),
                            out_specs=(P(), P(), P()),
                            check_rep=False)
    return jax.jit(stepper, donate_argnums=(0, 1))


def shard_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Data-parallel step over the mesh via ``shard_map``: batch sharded on
    ``axis_name``, params replicated, the gradient pmean riding ICI.

    The step must be built with ``make_train_step(..., axis_name=...)`` so
    the pmean happens inside (unlike GSPMD auto-partitioning, shard_map
    hands each device its LOCAL batch shard — which is also what lets the
    Pallas scan kernels run per-device without XLA having to partition a
    custom call it cannot see into)."""
    from jax.experimental.shard_map import shard_map

    stepped = shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), P(), (P(None, axis_name), P(None, axis_name))),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(stepped, donate_argnums=(0, 1))


@dataclasses.dataclass
class TrainState:
    """Checkpointable training state (parity with the reference ckpt dict
    fields, train.py:362-371)."""

    step: int
    params: Any
    opt_state: Any
    run_id: Optional[str] = None
    training_time_seconds: float = 0.0
