"""Objective speech-quality evaluation (reference src/util/python_eval.py +
denoise_eval.py equivalents).

PESQ requires the ITU-T P.862 C implementation (pip ``pesq``); it is used
when installed and reported as None otherwise.  STOI is a self-contained
numpy implementation of Taal et al. 2011 (no pystoi dependency).
"""

from cleanumamba_tpu.eval.metrics import (
    eval_waveform,
    stoi,
    segmental_snr,
    llr,
    wss,
    si_sdr,
    composite_scores,
)
from cleanumamba_tpu.eval.validate import validate

__all__ = [
    "eval_waveform",
    "stoi",
    "segmental_snr",
    "llr",
    "wss",
    "si_sdr",
    "composite_scores",
    "validate",
]
