"""TPU-first compute ops.

All activations are channels-last ``(B, L, C)`` so the feature dimension maps
onto the TPU's 128-lane registers and matmuls hit the MXU.
"""

from cleanumamba_tpu.ops.conv import (
    conv1d,
    conv1d_strided_matmul,
    conv_transpose1d,
    causal_depthwise_conv,
    glu_activation,
)
from cleanumamba_tpu.ops.norms import layer_norm, rms_norm
from cleanumamba_tpu.ops.scan import (
    selective_scan,
    selective_scan_ref,
    selective_scan_step,
)

__all__ = [
    "conv1d",
    "conv1d_strided_matmul",
    "conv_transpose1d",
    "causal_depthwise_conv",
    "glu_activation",
    "layer_norm",
    "rms_norm",
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_step",
]
