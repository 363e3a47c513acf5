"""On-chip proof of the TPU-platform serving bundle (docs/serving.md).

The export tests (tests/test_export.py) run under conftest's forced-CPU
platform, so the bundles they verify are pure StableHLO.  This script
proves the leg export.py exists for: the streaming prime/step exported ON
the TPU backend — where stream_step_block's bottleneck lowers through the
Pallas scan kernel as a ``tpu_custom_call`` (Mosaic) — loaded in a FRESH
process with no model-definition imports on the serving side, and driven
on-chip against the live jitted step.

Two phases (two processes, run both on the chip):

    python scripts/export_tpu_proof.py export <ckpt> <bundle_dir> [block]
    python scripts/export_tpu_proof.py drive  <ckpt> <bundle_dir>

``drive`` loads the bundle, checks bundle.json's platforms/batch/block
schema fields, streams a synthetic utterance through prime + steps with
BOTH the loaded callables and freshly-jitted live functions, and prints
the max abs error (expected: exact — same StableHLO, same backend).
Results recorded in docs/serving.md.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_STEPS = 6


def main():
    mode, ckpt, out = sys.argv[1], sys.argv[2], sys.argv[3]
    block = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    import jax
    import jax.numpy as jnp

    from cleanumamba_tpu.cli.denoise import load_any_checkpoint
    from cleanumamba_tpu.models.cleanumamba import count_params, prepare_for_length

    cfg, params, _ = load_any_checkpoint(ckpt)
    params = prepare_for_length(params, cfg, 4 * cfg.frame_length)
    print(f"{count_params(params)/1e6:.3f}M params ({cfg.bottleneck}) "
          f"backend={jax.default_backend()}", flush=True)

    if mode == "export":
        from cleanumamba_tpu import export as ex

        prime, step = ex.export_stream(params, cfg, batch=1, block=block)
        ex.save_bundle(out, cfg, {"prime": prime, "step": step},
                       extra_meta={"ckpt": ckpt})
        meta = json.load(open(os.path.join(out, "bundle.json")))
        print(json.dumps({
            "wrote": out,
            "platforms": meta["functions"]["step"]["platforms"],
            "batch": meta["batch"], "block": meta["block"],
            "step_bytes": os.path.getsize(os.path.join(out, "step.shlo")),
            "mosaic": "tpu_custom_call" in open(
                os.path.join(out, "step.shlo"), "rb").read().decode(
                    "latin-1"),
        }), flush=True)
        return

    assert mode == "drive"
    from cleanumamba_tpu.export import load_bundle
    from cleanumamba_tpu.streaming import stream_prime, stream_step_block

    cfg2, fns = load_bundle(out)
    assert cfg2 == cfg, "bundle config mismatch"
    meta = json.load(open(os.path.join(out, "bundle.json")))
    block = meta["block"]
    fl, ts = cfg.frame_length, cfg.total_stride

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, fl + N_STEPS * block * ts)).astype(np.float32) * 0.1
    f0 = jnp.asarray(audio[:, :fl])

    live_prime = jax.jit(lambda p, f: stream_prime(p, cfg, f))
    live_step = jax.jit(lambda p, s, n: stream_step_block(p, cfg, s, n))

    st_l, out_l = fns["prime"](params, f0)
    st_d, out_d = live_prime(params, f0)
    errs = [float(jnp.max(jnp.abs(out_l - out_d)))]
    pos = fl
    for _ in range(N_STEPS):
        new = jnp.asarray(audio[:, pos: pos + block * ts])
        st_l, ol = fns["step"](params, st_l, new)
        st_d, od = live_step(params, st_d, new)
        errs.append(float(jnp.max(jnp.abs(ol - od))))
        pos += block * ts
    state_err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                    for a, b in zip(jax.tree_util.tree_leaves(st_l),
                                    jax.tree_util.tree_leaves(st_d))
                    if a.size)  # the deepest enc cache is empty by design
    print(json.dumps({
        "platforms": meta["functions"]["step"]["platforms"],
        "backend": jax.default_backend(),
        "batch": meta["batch"], "block": block,
        "max_abs_err_per_call": errs,
        "state_max_abs_err": state_err,
        "finite": bool(jnp.isfinite(ol).all()),
    }), flush=True)


if __name__ == "__main__":
    main()
