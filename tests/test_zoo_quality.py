"""Published quality orderings on the released checkpoints (VERDICT r2 #2).

The DNS test set is absent from this sandbox, so absolute BASELINE parity
(PESQ 2.42 / STOI 95.1 at 442K, reference README.md:11,30) is unmeasurable
here; the strongest available proxy is the published quality ORDERING
(README.md:59-164) reproduced on synthetic noisy speech.  The sweep itself
runs on the TPU chip (scripts/zoo_quality.py, ~30 min for 13 checkpoints)
and persists per-model metric means to docs/zoo_quality.json; this test
asserts the orderings on that committed artifact so the gate runs in every
suite without re-denoising.

Asserted (with tolerance for synthetic-material noise):
- every model improves PESQ over the unprocessed noisy baseline,
- within each pruned chain (E8, E6) PESQ-WB rises with parameter count,
- the bottleneck ablation orders LSTM lowest (published: LSTM 2.32 <
  MHA 2.37 ~ S4 2.36 < Mamba 2.42 — we assert the coarse end, LSTM <=
  mamba-family, since the published mid-gaps of 0.01-0.05 MOS are inside
  the metric's resolution on synthetic material).
"""

import json
import os

import pytest

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "zoo_quality.json")

E8_CHAIN = ["E8 pruned 200K", "E8 pruned 500K", "E8 pruned 1M", "E8 pruned 2M"]
E6_CHAIN = ["E6 pruned 200K", "E6 pruned 500K", "E6 pruned 1M", "E6 pruned 2M"]
ABLATION = ["Mamba 442K", "Mamba2 428K", "Mamba-S4 451K", "LSTM 443K", "MHA 443K"]

# PESQ on synthetic material resolves ~0.05 MOS reliably (see
# scripts/calibrate_pesq.py); allow inversions smaller than that.
TOL = 0.05


@pytest.fixture(scope="module")
def zoo():
    if not os.path.exists(DOC):
        pytest.skip("docs/zoo_quality.json not generated (run scripts/zoo_quality.py)")
    with open(DOC) as f:
        data = json.load(f)
    models = data["models"]
    missing = [m for m in ["noisy"] + E8_CHAIN + E6_CHAIN + ABLATION
               if m not in models or "error" in models[m]]
    assert not missing, f"sweep incomplete: {missing}"
    return models


def test_all_models_beat_noisy(zoo):
    base = zoo["noisy"]["pesq_wb"]
    for m in E8_CHAIN + E6_CHAIN + ABLATION:
        assert zoo[m]["pesq_wb"] > base + 0.05, (m, zoo[m]["pesq_wb"], base)


@pytest.mark.parametrize("chain", [E8_CHAIN, E6_CHAIN], ids=["E8", "E6"])
def test_pruned_chain_pesq_monotone(zoo, chain):
    vals = [zoo[m]["pesq_wb"] for m in chain]
    for a, b, ma, mb in zip(vals, vals[1:], chain, chain[1:]):
        assert b >= a - TOL, f"{mb} ({b}) < {ma} ({a}) beyond tol"
    # and the chain spans a real quality range, not a flat line
    assert vals[-1] > vals[0], (chain, vals)


def test_ablation_lstm_not_best(zoo):
    lstm = zoo["LSTM 443K"]["pesq_wb"]
    mamba = zoo["Mamba 442K"]["pesq_wb"]
    assert lstm <= mamba + TOL, (lstm, mamba)


def test_params_recorded_match_convert(zoo):
    """The sweep's param counts must equal the converter's exact counts."""
    assert zoo["Mamba 442K"]["params"] == 441_601
    assert zoo["E8 pruned 500K"]["params"] == 491_655
