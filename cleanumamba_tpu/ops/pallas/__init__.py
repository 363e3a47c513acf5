"""Pallas TPU kernels for the hot compute paths."""

from cleanumamba_tpu.ops.pallas.selective_scan import (
    pallas_selective_scan,
    selective_scan_auto,
)

__all__ = ["pallas_selective_scan", "selective_scan_auto"]
