"""Tune the Pallas scan kernels on the real TPU (E8 bottleneck shapes)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cleanumamba_tpu.ops.pallas.selective_scan import pallas_selective_scan
from cleanumamba_tpu.ops.scan import selective_scan_ref


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    Bz, Lb, d_inner, d_state = 2, 625, 2048, 64
    u = jnp.asarray(rng.normal(size=(Bz, Lb, d_inner)).astype(np.float32))
    dt = jnp.abs(jnp.asarray(rng.normal(size=(Bz, Lb, d_inner)).astype(np.float32))) * 0.1
    A = -jnp.abs(jnp.asarray(rng.normal(size=(d_inner, d_state)).astype(np.float32))) - 0.1
    Bm = jnp.asarray(rng.normal(size=(Bz, Lb, d_state)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(Bz, Lb, d_state)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d_inner,)).astype(np.float32))

    y_ref, h_ref = jax.jit(selective_scan_ref)(u, dt, A, Bm, Cm, D)
    sync(y_ref)

    for chunk in (16, 32, 64, 128):
        for tile_d in (128, 256, 512):
            if chunk * tile_d * d_state * 4 > 6 * 2**20:  # skip >6MB buffers
                continue
            fn = jax.jit(lambda *a, c=chunk, t=tile_d: pallas_selective_scan(
                *a, chunk=c, tile_d=t))
            try:
                y, h = fn(u, dt, A, Bm, Cm, D)
                err = float(jnp.max(jnp.abs(y - y_ref)))
                herr = float(jnp.max(jnp.abs(h - h_ref)))
                t = timeit(fn, u, dt, A, Bm, Cm, D)
                print(f"chunk={chunk:4d} tile={tile_d:4d}: {t:7.2f} ms  "
                      f"max|dy|={err:.2e} max|dh|={herr:.2e}", flush=True)
            except Exception as e:
                print(f"chunk={chunk:4d} tile={tile_d:4d}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    # full VJP: pallas fwd + pallas bwd vs XLA chunked reverse
    from cleanumamba_tpu.ops.pallas.selective_scan import selective_scan_auto
    from cleanumamba_tpu.ops.scan import selective_scan_grad

    def loss_p(*a):
        y, h = selective_scan_auto(*a, None, 32)
        return jnp.sum(y ** 2) + jnp.sum(h ** 2)

    def loss_x(*a):
        y, h = selective_scan_grad(*a, None, 32)
        return jnp.sum(y ** 2) + jnp.sum(h ** 2)

    g_p = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5)))
    g_x = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3, 4, 5)))
    gp = g_p(u, dt, A, Bm, Cm, D)
    gx = g_x(u, dt, A, Bm, Cm, D)
    for a, b, n in zip(gp, gx, "u dt A B C D".split()):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        print(f"grad {n}: rel err {rel:.2e}")
    print(f"pallas fwd+bwd: {timeit(g_p, u, dt, A, Bm, Cm, D):7.2f} ms")
    print(f"XLA    fwd+bwd: {timeit(g_x, u, dt, A, Bm, Cm, D):7.2f} ms")


if __name__ == "__main__":
    main()
