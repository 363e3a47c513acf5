"""Distribution: device meshes + sharding helpers.

Replaces the reference's hand-rolled NCCL DDP (rank-0 param broadcast +
bucketed grad allreduce via autograd hooks + one subprocess per GPU,
/root/reference/src/training/train_distributed.py:44-181) with single-program
``shard_map`` over a ``jax.sharding.Mesh``: the batch is sharded over the
``data`` axis, params are replicated, and the gradient pmean rides ICI.
``sequence.py`` additionally shards the TIME axis of one long waveform
across the mesh (exact sequence parallelism via halo ppermute + SSM segment
composition), and ``tensor.py`` shards the WEIGHTS over a ``model`` axis
(Megatron-style intra-layer parallelism, composable with DP on a 2-D mesh).
"""

from cleanumamba_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
)
from cleanumamba_tpu.parallel.sequence import sp_stream_denoise
from cleanumamba_tpu.parallel.tensor import tp_forward, tp_prepare

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "sp_stream_denoise", "tp_forward", "tp_prepare"]
