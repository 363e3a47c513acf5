"""Model families.

``build_model`` mirrors the reference's ``Net`` factory
(/root/reference/src/network/network.py:5-11), extended to cover the MHA
variant which the reference ships as a separate "CleanUNet" network name
(configs/exp/models/DNS-CleanUMamba-FullMiniMambaMHA.json).
"""

from cleanumamba_tpu.models.cleanumamba import (
    init_params,
    forward,
    count_params,
)

__all__ = ["init_params", "forward", "count_params"]
