"""Mamba-S4 bottleneck mixer (reference ``mamba_s4`` flag,
src/network/S4/MambaS4.py + vendored S4 DPLR kernels in S4_fuctions.py).

Structure (from MambaS4.py:367-474 and the released
``Experiment_CleanU_MambaS4.pkl`` shapes):

    in_proj -> split (x, z) -> causal depthwise conv(K=4) + SiLU
    -> input_linear (d_inner -> d_ssm) -> S4Block/FFTConv (DPLR kernel,
       FFT long convolution + D skip + GELU) -> output_linear (d_ssm ->
       2*d_inner) -> GLU -> * SiLU(z) -> out_proj

The S4 DPLR kernel K(L) is built from (A_real, A_imag, P, B, C, inv_dt) via
the bilinear discretisation + Woodbury low-rank correction, then the long
convolution runs as an FFT (XLA rfft — replaces the reference's pykeops
Cauchy reductions which are only a memory optimisation at these sizes).

Round-1 status: forward/step are NOT yet implemented — importing this module
is safe; calling raises.  The remaining work is the DPLR kernel math.
"""

from __future__ import annotations

import jax.numpy as jnp


def mixer_forward(p, x, chunk: int = 32):
    raise NotImplementedError(
        "Mamba-S4 bottleneck forward lands with the S4 DPLR kernel port; "
        "use bottleneck='mamba' meanwhile."
    )


def mixer_init(key, cfg, dtype=jnp.float32):
    raise NotImplementedError("Mamba-S4 init not yet implemented")


def mixer_init_cache(p, batch_size: int, dtype=jnp.float32):
    raise NotImplementedError("Mamba-S4 streaming not yet implemented")


def mixer_step(p, cache, x):
    raise NotImplementedError("Mamba-S4 streaming not yet implemented")
