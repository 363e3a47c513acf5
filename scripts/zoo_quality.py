"""Quality-ordering sweep: every released checkpoint on synthetic noisy speech.

The BASELINE quality gate (PESQ 2.42 / STOI 95.1 at 442K params,
/root/reference/README.md:11,30) is defined on the DNS no-reverb test set,
which is absent from this sandbox.  The strongest in-reach proxy is the
*published quality ordering* (README.md:59-164): within each pruned chain
PESQ/STOI rise with parameter count, and the bottleneck ablation orders
LSTM < MHA ~ S4 < Mamba.  This script denoises a fixed bank of synthetic
speech-like utterances (cleanumamba_tpu/eval/synth.py) at several SNRs and
noise types with all 13 converted checkpoints, scores each output with the
full eval_waveform metric stack (from-scratch PESQ + STOI + composites),
and persists per-model means to docs/zoo_quality.json — which
tests/test_zoo_quality.py then asserts the orderings on.

Run on the TPU chip (~30 min, one compile per checkpoint):
    python scripts/zoo_quality.py --doc
Partial runs: --only Mamba   (substring filter, appends to existing JSON)
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPTS = [
    ("Mamba 442K", "experiments/Experiment_CleanU_Mamba.pkl"),
    ("Mamba2 428K", "experiments/Experiment_CleanU_Mamba2.pkl"),
    ("Mamba-S4 451K", "experiments/Experiment_CleanU_MambaS4.pkl"),
    ("LSTM 443K", "experiments/Experiment_CleanU_LSTM.pkl"),
    ("MHA 443K", "experiments/Experiment_CleanU_MHA.pkl"),
    ("E8 pruned 2M", "pruned/CleanUMamba-3N-E8_pruned-2M.pkl"),
    ("E8 pruned 1M", "pruned/CleanUMamba-3N-E8_pruned-1M.pkl"),
    ("E8 pruned 500K", "pruned/CleanUMamba-3N-E8_pruned-500K.pkl"),
    ("E8 pruned 200K", "pruned/CleanUMamba-3N-E8_pruned-200K.pkl"),
    ("E6 pruned 2M", "pruned/CleanUMamba-3N-E6_pruned-2M.pkl"),
    ("E6 pruned 1M", "pruned/CleanUMamba-3N-E6_pruned-1M.pkl"),
    ("E6 pruned 500K", "pruned/CleanUMamba-3N-E6_pruned-500k.pkl"),
    ("E6 pruned 200K", "pruned/CleanUMamba-3N-E6_pruned-200k.pkl"),
]

SECONDS = 4.0
FS = 16000
N_UTTS = 6
CONDITIONS = [  # (noise kind, SNR dB) — spans easy to hard
    ("white", 5.0), ("white", 10.0), ("white", 15.0),
    ("pink", 10.0), ("babble", 10.0), ("babble", 15.0),
]
# covl intentionally absent: LLR/WSS saturate their clamps on synthetic
# material (every model pins covl to 1.0), carrying no ordering signal.
METRICS = ("pesq_wb", "pesq_nb", "stoi", "si_sdr")


def make_bank(material: str = "like"):
    """(clean[(U,L)], noisy[(U*C, L)]) — utterance-major condition order."""
    from cleanumamba_tpu.eval.synth import add_noise, speech_dense, speech_like

    gen = {"like": speech_like, "dense": speech_dense}[material]
    cleans = np.stack([gen(100 + u, SECONDS, FS) for u in range(N_UTTS)])
    rows = []
    for u in range(N_UTTS):
        for ci, (kind, snr) in enumerate(CONDITIONS):
            rows.append(add_noise(cleans[u], snr, seed=500 + 17 * u + ci, kind=kind))
    return cleans, np.stack(rows)


def score_batch(cleans, outs):
    """Mean of each metric over all utterances x conditions."""
    from cleanumamba_tpu.eval.metrics import eval_waveform

    acc = {m: [] for m in METRICS}
    n_cond = len(CONDITIONS)
    for i in range(outs.shape[0]):
        r = eval_waveform(cleans[i // n_cond], outs[i], FS)
        for m in METRICS:
            if r.get(m) is not None:
                acc[m].append(r[m])
    return {m: (round(float(np.mean(v)), 4) if v else None)
            for m, v in acc.items()}


def eval_ckpt(path, cleans, noisy):
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.convert import load_reference_checkpoint
    from cleanumamba_tpu.models.cleanumamba import (
        count_params,
        forward,
        prepare_for_length,
    )

    cfg, params, _ = load_reference_checkpoint(path)
    n_params = count_params(params)
    L = noisy.shape[1]
    params = prepare_for_length(params, cfg, L)
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))
    outs = np.asarray(fwd(params, jnp.asarray(noisy, jnp.float32)))
    assert np.isfinite(outs).all(), path
    return n_params, score_batch(cleans, outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference/checkpoints")
    ap.add_argument("--only", default=None)
    ap.add_argument("--material", default="dense", choices=("like", "dense"),
                    help="synthetic material generator (eval/synth.py); dense "
                         "approximates recorded speech more closely and is the "
                         "one the committed orderings use")
    ap.add_argument("--json", default=None,
                    help="defaults to docs/zoo_quality.json (dense) or "
                         "docs/zoo_quality_<material>.json otherwise")
    ap.add_argument("--doc", action="store_true",
                    help="also rewrite docs/zoo_quality.md from the JSON")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; sitecustomize "
                         "ignores JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.json is None:
        suffix = "" if args.material == "dense" else f"_{args.material}"
        args.json = os.path.join(REPO, "docs", f"zoo_quality{suffix}.json")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cleans, noisy = make_bank(args.material)
    results = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f).get("models", {})

    # unprocessed baseline: the noisy mixtures themselves
    if "noisy" not in results or not args.only:
        results["noisy"] = {"params": 0, **score_batch(cleans, noisy)}
        print(json.dumps({"model": "noisy", **results["noisy"]}), flush=True)

    for name, rel in CKPTS:
        if args.only and args.only not in name:
            continue
        try:
            n_params, scores = eval_ckpt(os.path.join(args.root, rel), cleans, noisy)
            results[name] = {"params": int(n_params), **scores}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({"model": name, **results[name]}), flush=True)
        payload = {
            "material": {
                "generator": args.material,
                "n_utts": N_UTTS, "seconds": SECONDS, "fs": FS,
                "conditions": CONDITIONS,
                "note": "synthetic speech-like utterances (eval/synth.py); "
                        "orderings proxy for the DNS test set, not absolute parity",
            },
            "models": results,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)

    if args.doc:
        suffix = "" if args.material == "dense" else f"_{args.material}"
        doc = os.path.join(REPO, "docs", f"zoo_quality{suffix}.md")
        lines = [
            "# Released-checkpoint quality sweep (synthetic material)",
            "",
            "All 13 converted reference checkpoints denoising the same bank of",
            f"{N_UTTS} synthetic utterances (`eval/synth.py::speech_{args.material}`)",
            f"x {len(CONDITIONS)} noise conditions (white/pink/babble at 5-15 dB",
            "SNR), scored with the from-scratch eval stack (PESQ P.862 / STOI /",
            "SI-SDR).  The DNS test set is not available in this environment, so",
            "these are ORDERING evidence (paper README.md:59-164), not absolute",
            "parity; see tests/test_zoo_quality.py for the asserted orderings.",
            "PESQ here carries the calibration uncertainty documented in",
            "eval/pesq_p862.py.",
            "",
            "| model | params | PESQ-WB | PESQ-NB | STOI | SI-SDR (dB) |",
            "|---|---|---|---|---|---|",
        ]
        order = ["noisy"] + [n for n, _ in CKPTS]
        for name in order:
            r = results.get(name)
            if r is None:
                continue
            if "error" in r:
                lines.append(f"| {name} | — | ERROR: {r['error']} | | | |")
                continue
            lines.append(
                f"| {name} | {r['params']:,} | {r['pesq_wb']} | {r['pesq_nb']} "
                f"| {r['stoi']} | {r['si_sdr']} |")
        with open(doc, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", doc, file=sys.stderr)


if __name__ == "__main__":
    main()
