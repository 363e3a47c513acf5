"""Host-side data pipeline: wav IO, paired clean/noisy datasets, prefetch."""

from cleanumamba_tpu.data.dataset import (
    CleanNoisyPairDataset,
    SyntheticDenoiseDataset,
    NoisyOnlyDataset,
    make_loader,
    make_training_loader,
)

__all__ = [
    "CleanNoisyPairDataset",
    "SyntheticDenoiseDataset",
    "NoisyOnlyDataset",
    "make_loader",
    "make_training_loader",
]
