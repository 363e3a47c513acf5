"""Component-level timing of the E8 train step (pipelined, one sync)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig
from cleanumamba_tpu.losses import loss_fn
from cleanumamba_tpu.models.cleanumamba import forward, init_params


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = CleanUMambaConfig()
    loss_cfg = LossConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    L = 160_000
    clean = jnp.asarray(rng.normal(size=(2, L)).astype(np.float32) * 0.3)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(2, L)).astype(np.float32))
    bf16 = lambda p: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    fwd32 = jax.jit(lambda p, x: forward(p, x, cfg))
    print(f"model forward fp32:      {timeit(fwd32, params, noisy):7.1f} ms")
    pb = bf16(params)
    print(f"model forward bf16:      {timeit(fwd32, pb, noisy):7.1f} ms")

    def full_loss(p, c, x):
        yhat = forward(p, x, cfg)
        l, _ = loss_fn(c, yhat, loss_cfg)
        return l

    jl = jax.jit(full_loss)
    print(f"loss fwd (bf16 params):  {timeit(jl, pb, clean, noisy):7.1f} ms")

    jg = jax.jit(jax.grad(full_loss))
    print(f"grad (fp32):             {timeit(jg, params, clean, noisy):7.1f} ms")
    jgb = jax.jit(lambda p, c, x: jax.grad(full_loss)(bf16(p), c, x))
    print(f"grad (bf16 compute):     {timeit(jgb, params, clean, noisy):7.1f} ms")

    only_stft = jax.jit(lambda c, y: loss_fn(c, y, loss_cfg)[0])
    print(f"stft loss alone:         {timeit(only_stft, clean, noisy):7.1f} ms")

    g_stft = jax.jit(jax.grad(lambda y, c: loss_fn(c, y, loss_cfg)[0]))
    print(f"stft loss grad:          {timeit(g_stft, noisy, clean):7.1f} ms")


if __name__ == "__main__":
    main()
