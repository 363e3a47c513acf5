"""Evaluation CLI (reference src/util/python_eval.py:461-479 standalone DNS
eval + denoise_eval.py test_validation): run the full metric suite over a
paired test set, print length-weighted means."""

from __future__ import annotations

import argparse
import json

from cleanumamba_tpu.cli.denoise import load_any_checkpoint
from cleanumamba_tpu.data import CleanNoisyPairDataset, SyntheticDenoiseDataset
from cleanumamba_tpu.eval.validate import validate


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", default=None,
                    help="DNS-style root (datasets/test_set/synthetic/no_reverb)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--dataset", default="dns", choices=["dns", "VCTK-DEMAND"])
    ap.add_argument("--max-items", type=int, default=None)
    ap.add_argument("--pad-to-sec", type=float, default=10.0)
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    args = ap.parse_args(argv)

    cfg, params, _ = load_any_checkpoint(args.ckpt)
    if args.synthetic or not args.data_root:
        ds = SyntheticDenoiseDataset(n_items=args.max_items or 16, seed=4242)
    else:
        ds = CleanNoisyPairDataset(args.data_root, "testing",
                                   dataset=args.dataset)
    metrics = validate(
        params, cfg, ds, max_items=args.max_items,
        pad_to=int(args.pad_to_sec * 16000), verbose=not args.json,
    )
    if args.json:
        print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
    else:
        print("== length-weighted means ==")
        for k, v in metrics.items():
            print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
