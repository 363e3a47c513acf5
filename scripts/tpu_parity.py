"""Every released checkpoint: TPU (Pallas scan) forward vs CPU (XLA scan)."""
import subprocess, sys, json, os
import numpy as np

CKPTS = [
    "experiments/Experiment_CleanU_Mamba.pkl",
    "experiments/Experiment_CleanU_Mamba2.pkl",
    "experiments/Experiment_CleanU_MambaS4.pkl",
    "experiments/Experiment_CleanU_LSTM.pkl",
    "experiments/Experiment_CleanU_MHA.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-2M.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-1M.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-500K.pkl",
    "pruned/CleanUMamba-3N-E8_pruned-200K.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-2M.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-1M.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-500k.pkl",
    "pruned/CleanUMamba-3N-E6_pruned-200k.pkl",
]

WORKER = r'''
import sys, numpy as np, jax
if sys.argv[2] == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cleanumamba_tpu.convert import load_reference_checkpoint
from cleanumamba_tpu.models.cleanumamba import forward, prepare_for_length
cfg, params, _ = load_reference_checkpoint(sys.argv[1])
params = prepare_for_length(params, cfg, 16000)
x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16000)).astype(np.float32) * 0.2)
with jax.default_matmul_precision("highest"):
    y = np.asarray(forward(params, x, cfg))
np.save(sys.argv[3], y)
'''
open('/tmp/parity_worker.py', 'w').write(WORKER)
root = "/root/reference/checkpoints"
for rel in CKPTS:
    path = os.path.join(root, rel)
    ok = True
    for dev in ("cpu", "tpu"):
        # PREPEND the repo to PYTHONPATH: the sandbox registers the TPU
        # backend via PYTHONPATH=/root/.axon_site, so overwriting the
        # variable (rather than extending it) silently kills the tpu leg.
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
        r = subprocess.run([sys.executable, "/tmp/parity_worker.py", path, dev,
                            f"/tmp/y_{dev}.npy"], capture_output=True, text=True,
                           timeout=1200, env=env)
        if r.returncode != 0:
            print(f"{rel}: {dev} FAIL: {r.stderr.strip().splitlines()[-1][:120]}", flush=True)
            ok = False
            break
    if not ok:
        continue
    a, b = np.load("/tmp/y_cpu.npy"), np.load("/tmp/y_tpu.npy")
    scale = np.abs(a).max() + 1e-12
    rel_err = np.abs(a - b).max() / scale
    print(f"{rel}: max rel dev CPU-vs-TPU = {rel_err:.2e} "
          f"{'OK' if rel_err < 5e-2 else 'TOO BIG'}", flush=True)
