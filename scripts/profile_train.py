"""Break down the E8 train-step time on the real TPU: scan fwd/bwd vs rest."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, OptimizationConfig
from cleanumamba_tpu.models.cleanumamba import init_params
from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = CleanUMambaConfig()  # E8 full
    loss_cfg = LossConfig()
    opt_cfg = OptimizationConfig(n_iters=10_000)
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=True),
                   donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    L = 160_000
    clean = jnp.asarray(rng.normal(size=(1, 2, L)).astype(np.float32) * 0.3)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(1, 2, L)).astype(np.float32))

    def run(p, o):
        return step(p, o, (clean, noisy))

    # full step (donated args: re-init each call is too slow; time a chain)
    for _ in range(2):
        params, opt_state, aux = run(params, opt_state)
    jax.block_until_ready(params)
    print("loss after warmup:", float(aux["loss"]))
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        params, opt_state, aux = run(params, opt_state)
        _ = float(aux["loss"])  # hard sync every step
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"full train step (sync/step): {dt_ms:.1f} ms, loss={float(aux['loss']):.4f}")
    # pipelined: steps chain on device; one sync at the end -> true device time
    t0 = time.perf_counter()
    for _ in range(N):
        params, opt_state, aux = run(params, opt_state)
    _ = float(aux["loss"])
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"full train step (pipelined): {dt_ms:.1f} ms")

    # scan alone: E8 bottleneck shapes (L_b = L/256, d_inner=2048, d_state=64)
    from cleanumamba_tpu.ops.pallas.selective_scan import (
        pallas_selective_scan, selective_scan_auto)
    from cleanumamba_tpu.ops.scan import selective_scan_grad

    Lb = L // 256  # 625
    d_inner, d_state, Bz = 2048, 64, 2
    n_layers = 3
    u = jnp.asarray(rng.normal(size=(Bz, Lb, d_inner)).astype(np.float32))
    dt = jnp.abs(jnp.asarray(rng.normal(size=(Bz, Lb, d_inner)).astype(np.float32))) * 0.1
    A = -jnp.abs(jnp.asarray(rng.normal(size=(d_inner, d_state)).astype(np.float32))) - 0.1
    Bm = jnp.asarray(rng.normal(size=(Bz, Lb, d_state)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(Bz, Lb, d_state)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d_inner,)).astype(np.float32))

    fwd = jax.jit(lambda *a: pallas_selective_scan(*a)[0])
    t = timeit(fwd, u, dt, A, Bm, Cm, D)
    print(f"pallas scan fwd (1 layer, Lb={Lb}): {t:.2f} ms -> x{n_layers} = {t*n_layers:.1f}")

    g_pallas = jax.jit(jax.grad(
        lambda *a: jnp.sum(selective_scan_auto(*a, None, None)[0] ** 2),
        argnums=(0, 1, 2, 3, 4, 5)))
    t = timeit(g_pallas, u, dt, A, Bm, Cm, D)
    print(f"pallas fwd + XLA chunked bwd: {t:.2f} ms -> x{n_layers} = {t*n_layers:.1f}")

    g_xla = jax.jit(jax.grad(
        lambda *a: jnp.sum(selective_scan_grad(*a, None, 32)[0] ** 2),
        argnums=(0, 1, 2, 3, 4, 5)))
    t = timeit(g_xla, u, dt, A, Bm, Cm, D)
    print(f"XLA fwd + XLA chunked bwd:    {t:.2f} ms")


if __name__ == "__main__":
    main()
