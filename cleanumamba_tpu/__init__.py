"""CleanUMamba-TPU: a TPU-native (JAX/XLA/Pallas) speech-denoising framework.

A from-scratch reimplementation of the capabilities of lab-emi/CleanUMamba
(ISCAS 2025, arXiv:2410.11062) designed TPU-first:

- Functional core: models are pure ``apply(params, x)`` over pytrees.
- Offline denoising: chunked associative-scan selective SSM (MXU/VPU friendly).
- Streaming denoising: constant-memory carried-state step functions, fully
  jittable with static shapes.
- Training: optax + data-parallel ``jax.sharding`` over a device mesh.
- Pruning: pytree -> pytree structured channel pruning with dependency groups.

Reference parity map lives in each module's docstring (file:line citations
into /root/reference).
"""

__version__ = "0.1.0"

from cleanumamba_tpu.config import CleanUMambaConfig, load_experiment_config

__all__ = [
    "CleanUMambaConfig",
    "load_experiment_config",
    "__version__",
]
