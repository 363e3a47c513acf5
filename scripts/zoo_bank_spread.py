"""Measure the dense zoo bank's own metric spread (round-5 verdict item 6).

docs/zoo_quality.md's ordering rule needs a resolution grounded on the
bank it governs: re-mix the dense bank at R new noise seeds (same clean
utterances, same SNR/kind grid — fresh noise realizations; r=0 IS the
committed bank), score a panel of released checkpoints on every re-mix,
and report

  - per-model PESQ-WB mean +- std across re-mixes (how much a single
    model's score moves with the noise realization), and
  - per-claimed-pair PAIRED gap mean +- std (the statistic the ordering
    rule actually consumes: both models see the same bank, so common-mode
    bank hardness cancels).

Runs entirely on CPU (forces the CPU platform — the chip can keep
training); ~2-4 min per (model, bank) cell, dominated by the CPU forward
+ 36 host PESQ evals.

    python scripts/zoo_bank_spread.py [--remixes 4] [--json docs/zoo_bank_spread.json]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from zoo_quality import CONDITIONS, FS, N_UTTS, SECONDS, score_batch  # noqa: E402

# the models in the committed large-gap ordering claims (8 pairs) + the
# ablation cluster representatives
PANEL = [
    ("Mamba 442K", "experiments/Experiment_CleanU_Mamba.pkl"),
    ("MHA 443K", "experiments/Experiment_CleanU_MHA.pkl"),
    ("E8 pruned 2M", "pruned/CleanUMamba-3N-E8_pruned-2M.pkl"),
    ("E8 pruned 500K", "pruned/CleanUMamba-3N-E8_pruned-500K.pkl"),
    ("E8 pruned 200K", "pruned/CleanUMamba-3N-E8_pruned-200K.pkl"),
    ("E6 pruned 2M", "pruned/CleanUMamba-3N-E6_pruned-2M.pkl"),
    ("E6 pruned 500K", "pruned/CleanUMamba-3N-E6_pruned-500k.pkl"),
]

# the large-gap published orderings the rule asserts (docs/zoo_quality.md)
PAIRS = [
    ("E8 pruned 2M", "E8 pruned 200K"),
    ("E8 pruned 500K", "E8 pruned 200K"),
    ("E8 pruned 2M", "E8 pruned 500K"),   # sub-resolution here: inverts
    ("E6 pruned 2M", "E6 pruned 500K"),
    ("MHA 443K", "Mamba 442K"),           # ablation pair (published 0.05)
]


def make_bank_remix(r: int):
    from cleanumamba_tpu.eval.synth import add_noise, speech_dense

    cleans = np.stack([speech_dense(100 + u, SECONDS, FS)
                       for u in range(N_UTTS)])
    rows = []
    for u in range(N_UTTS):
        for ci, (kind, snr) in enumerate(CONDITIONS):
            rows.append(add_noise(cleans[u], snr,
                                  seed=500 + 17 * u + ci + 10000 * r,
                                  kind=kind))
    return cleans, np.stack(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remixes", type=int, default=4)
    ap.add_argument("--json", default="docs/zoo_bank_spread.json")
    ap.add_argument("--root", default="/root/reference/checkpoints")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.models.cleanumamba import forward, prepare_for_length

    banks = [make_bank_remix(r) for r in range(args.remixes)]
    results = {}  # model -> [per-remix pesq_wb]
    table = {}
    for label, rel in PANEL:
        cfg, params, _ = load_reference_checkpoint(
            os.path.join(args.root, rel))
        params = prepare_for_length(params, cfg, banks[0][1].shape[1])
        fwd = jax.jit(lambda p, x: forward(p, x, cfg))
        per_remix = []
        for r, (cleans, noisy) in enumerate(banks):
            outs = np.asarray(fwd(params, jnp.asarray(noisy, jnp.float32)))
            assert np.isfinite(outs).all(), (label, r)
            scores = score_batch(cleans, outs)
            per_remix.append(scores)
            print(json.dumps({"model": label, "remix": r, **scores}),
                  flush=True)
        pesqs = [s["pesq_wb"] for s in per_remix]
        results[label] = per_remix
        table[label] = {"pesq_wb_mean": round(float(np.mean(pesqs)), 4),
                        "pesq_wb_std": round(float(np.std(pesqs)), 4),
                        "pesq_wb": pesqs}
        print(json.dumps({"model": label, **table[label]}), flush=True)

    pair_stats = {}
    for a, b in PAIRS:
        gaps = [results[a][r]["pesq_wb"] - results[b][r]["pesq_wb"]
                for r in range(args.remixes)]
        pair_stats[f"{a} - {b}"] = {
            "gap_mean": round(float(np.mean(gaps)), 4),
            "gap_std": round(float(np.std(gaps)), 4),
            "gaps": [round(g, 4) for g in gaps],
            "sign_stable": bool(all(g > 0 for g in gaps)
                                or all(g < 0 for g in gaps)),
        }
        print(json.dumps({"pair": f"{a} - {b}", **pair_stats[f'{a} - {b}']}),
              flush=True)

    out = {"remixes": args.remixes, "models": table, "pairs": pair_stats,
           "note": "remix 0 is the committed docs/zoo_quality.json bank"}
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
