import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import numpy as np, jax.numpy as jnp
from cleanumamba_tpu.convert import load_reference_checkpoint
from cleanumamba_tpu.parallel.mesh import make_mesh
from cleanumamba_tpu.parallel.sequence import _WARM, sp_stream_denoise
from cleanumamba_tpu.streaming import Streamer
mesh = make_mesh(8)
for name, path in [
    ("Mamba 442K", "Experiment_CleanU_Mamba.pkl"),
    ("Mamba2 428K", "Experiment_CleanU_Mamba2.pkl"),
    ("MambaS4 451K", "Experiment_CleanU_MambaS4.pkl"),
]:
    cfg, params, _ = load_reference_checkpoint(
        '/root/reference/checkpoints/experiments/' + path)
    ts, fl = cfg.total_stride, cfg.frame_length
    rng = np.random.default_rng(0)
    L = 16000
    x = (rng.normal(size=(1, L)) * 0.1).astype(np.float32)
    y_sp = np.asarray(sp_stream_denoise(params, cfg, jnp.asarray(x), mesh))
    need = L + (fl - ts); unit = 8 * ts
    total = -(-need // unit) * unit
    ctx = fl + (_WARM - 1) * ts
    P = np.concatenate([np.zeros((1, ctx), np.float32), x,
                        np.zeros((1, total - L), np.float32)], axis=1)
    s = Streamer(params, cfg)
    ref = np.concatenate([s.feed(P), s.flush()], axis=1)[:, ctx:ctx+L]
    scale = np.abs(ref).max() + 1e-12
    print(f"{name}: 8-device SP vs streaming: max rel dev = "
          f"{np.abs(y_sp - ref).max()/scale:.2e}")
