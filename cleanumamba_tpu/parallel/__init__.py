"""Distribution: device meshes + sharding helpers.

Replaces the reference's hand-rolled NCCL DDP (rank-0 param broadcast +
bucketed grad allreduce via autograd hooks + one subprocess per GPU,
/root/reference/src/training/train_distributed.py:44-181) with single-program
``jax.jit`` over a ``jax.sharding.Mesh``: the batch is sharded over the
``data`` axis, params are replicated, and XLA inserts the gradient psum over
ICI automatically.
"""

from cleanumamba_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding"]
