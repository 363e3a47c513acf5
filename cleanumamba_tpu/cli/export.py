"""Export a checkpoint's compiled computations as a serving bundle.

TPU-native counterpart to the reference's serve-from-Python story
(src/denoise.py, the streaming demo in src/network/CleanUMamba.py:568-591):
serializes the offline forward and the streaming prime/step to StableHLO
(``jax.export``) so a serving process runs them without this package's
model code.  See cleanumamba_tpu/export.py for the bundle format.

    python -m cleanumamba_tpu.cli.export --ckpt <pkl> --out <dir> \
        [--length 160000] [--block 1] [--batch 1] [--selftest]

``--selftest`` reloads the bundle and checks the loaded functions against
the live ones on random input (exact on the same backend).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from cleanumamba_tpu import export as ex
from cleanumamba_tpu.cli.denoise import load_any_checkpoint
from cleanumamba_tpu.models.cleanumamba import (
    count_params,
    forward,
    prepare_for_length,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True, help="bundle directory to write")
    ap.add_argument("--length", type=int, default=160000,
                    help="offline forward input length (samples)")
    ap.add_argument("--block", type=int, default=1,
                    help="streaming step granularity in frames")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--selftest", action="store_true",
                    help="reload the bundle and compare against live calls")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                    help="lowering platform (default: the active backend); "
                         "cpu bundles are pure StableHLO, tpu bundles embed "
                         "Mosaic kernels and need a compatible libtpu")
    args = ap.parse_args(argv)
    if args.block < 1 or args.batch < 1 or args.length < 1:
        ap.error("--block/--batch/--length must be >= 1")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg, params, _ = load_any_checkpoint(args.ckpt)
    L = cfg.valid_length(args.length)
    params = prepare_for_length(params, cfg, max(2 * L, 2 * cfg.frame_length))
    print(f"exporting {count_params(params)/1e6:.3f}M params "
          f"({cfg.bottleneck}) on {jax.default_backend()}: "
          f"offline L={L}, stream block={args.block}, batch={args.batch}")

    t0 = time.time()
    offline = ex.export_offline(params, cfg, L, batch=args.batch)
    prime, step = ex.export_stream(params, cfg, batch=args.batch,
                                   block=args.block)
    # batch/block land in the bundle schema automatically (save_bundle
    # derives them from the traced shapes)
    ex.save_bundle(args.out, cfg,
                   {"offline": offline, "prime": prime, "step": step},
                   extra_meta={"length": L, "ckpt": args.ckpt})
    print(f"wrote {args.out} in {time.time()-t0:.1f}s "
          f"(platforms {list(offline.platforms)})")

    if args.selftest:
        from cleanumamba_tpu.streaming import stream_prime

        cfg2, fns = ex.load_bundle(args.out)
        assert cfg2 == cfg
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(args.batch, L)).astype(np.float32) * 0.1)
        # exactness baseline is the JITTED live function — the artifact
        # re-executes the same StableHLO the jit lowers to
        y_live = jax.jit(lambda p, a: forward(p, a, cfg))(params, x)
        err = float(jnp.max(jnp.abs(fns["offline"](params, x) - y_live)))
        print(f"selftest offline max|err| = {err:.3g}")
        f0 = x[:, : cfg.frame_length]
        st_l, out_l = fns["prime"](params, f0)
        st_d, out_d = jax.jit(lambda p, f: stream_prime(p, cfg, f))(params, f0)
        perr = float(jnp.max(jnp.abs(out_l - out_d)))
        print(f"selftest prime   max|err| = {perr:.3g}")
        new = x[:, cfg.frame_length : cfg.frame_length
                + args.block * cfg.total_stride]
        _, step_out = fns["step"](params, st_l, new)
        print(f"selftest step    out shape {tuple(step_out.shape)} "
              f"finite={bool(jnp.isfinite(step_out).all())}")
        assert err == 0.0 and perr == 0.0, "loaded bundle deviates from live"
        print("selftest OK")


if __name__ == "__main__":
    main()
