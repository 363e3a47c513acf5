"""Score the real-scale pruning lifecycle against the released chain.

The lifecycle (configs/prune_2m_synth.json): prune the RELEASED 2M E8
checkpoint to the ~500K scale with prune/driver.py on synthetic data,
finetune with cli/finetune.py, and compare on the zoo_quality synthetic
bank against (a) the unpruned 2M teacher, (b) the RELEASED 500K checkpoint
(the reference's own pruned+finetuned model at the same scale, trained on
real DNS data), and (c) the noisy input.  Success bars, in order of
strength:
  1. ours-pruned+finetuned beats noisy on PESQ (the machinery produces a
     denoiser at the target scale);
  2. it lands within reach of the released 500K on this bank, despite our
     finetune seeing ONLY synthetic material and a 64x-compressed schedule.

Run on the TPU chip:
    python scripts/prune_lifecycle_eval.py \
        --pruned exp/Prune-2M-synth/checkpoint \
        --finetuned exp/finetune-2M/checkpoint
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from zoo_quality import make_bank, score_batch  # noqa: E402


def eval_params(params, cfg, cleans, noisy):
    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.models.cleanumamba import (
        count_params,
        forward,
        prepare_for_length,
    )

    p = prepare_for_length(params, cfg, noisy.shape[1])
    outs = np.asarray(
        jax.jit(lambda pp, x: forward(pp, x, cfg))(
            p, jnp.asarray(noisy, jnp.float32)))
    assert np.isfinite(outs).all()
    return count_params(params), score_batch(cleans, outs)


def load_native(ckpt_dir):
    from cleanumamba_tpu.train.checkpoint import load_latest

    ck = load_latest(ckpt_dir)
    if ck is None:
        raise FileNotFoundError(ckpt_dir)
    return ck["params"], ck["config"], ck.get("iter")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pruned", default="exp/Prune-2M-synth/checkpoint")
    ap.add_argument("--finetuned", default=None)
    ap.add_argument("--scratch", default=None,
                    help="native ckpt dir of a FROM-SCRATCH teacher (round-5 "
                         "capstone: the whole chain carries zero reference "
                         "weights — scored as its own row)")
    ap.add_argument("--json", default=None,
                    help="also write results to this JSON file")
    ap.add_argument("--skip-released", action="store_true",
                    help="skip re-scoring the released 2M/500K conversions "
                         "(their rows on this same bank are already recorded "
                         "in docs/prune_lifecycle.json; re-compiling the "
                         "full E8 geometry costs chip-minutes)")
    args = ap.parse_args()

    from cleanumamba_tpu.convert import load_reference_checkpoint

    cleans, noisy = make_bank("dense")
    rows = {}
    rows["noisy"] = {"params": 0, **score_batch(cleans, noisy)}
    print(json.dumps({"model": "noisy", **rows["noisy"]}), flush=True)

    released = () if args.skip_released else (
        ("released 2M (teacher)", "pruned/CleanUMamba-3N-E8_pruned-2M.pkl"),
        ("released 500K", "pruned/CleanUMamba-3N-E8_pruned-500K.pkl"))
    for label, ref in released:
        cfg, params, _ = load_reference_checkpoint(
            os.path.join("/root/reference/checkpoints", ref))
        n, scores = eval_params(params, cfg, cleans, noisy)
        rows[label] = {"params": n, **scores}
        print(json.dumps({"model": label, **rows[label]}), flush=True)

    if args.scratch:
        params, cfg, it = load_native(args.scratch)
        n, scores = eval_params(params, cfg, cleans, noisy)
        rows["ours from-scratch teacher"] = {"params": n, "iter": it, **scores}
        print(json.dumps({"model": "ours from-scratch teacher",
                          **rows["ours from-scratch teacher"]}), flush=True)

    params, cfg, it = load_native(args.pruned)
    n, scores = eval_params(params, cfg, cleans, noisy)
    rows["ours pruned (no finetune)"] = {"params": n, "iter": it, **scores}
    print(json.dumps({"model": "ours pruned",
                      **rows["ours pruned (no finetune)"]}), flush=True)

    if args.finetuned:
        params, cfg, it = load_native(args.finetuned)
        n, scores = eval_params(params, cfg, cleans, noisy)
        rows["ours pruned+finetuned"] = {"params": n, "iter": it, **scores}
        print(json.dumps({"model": "ours pruned+finetuned",
                          **rows["ours pruned+finetuned"]}), flush=True)

    print(json.dumps({"model": "noisy", **rows["noisy"]}), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
