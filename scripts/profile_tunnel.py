"""Separate tunnel transfer costs from device compute."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=10):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # D2H latency: tiny array fetch
    one = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    t = timeit(lambda: np.asarray(f(one)), 20)
    print(f"D2H tiny fetch (np.asarray): {t*1e3:.2f} ms", flush=True)

    y = jax.block_until_ready(f(one))
    t = timeit(lambda: np.asarray(y), 20)
    print(f"D2H tiny fetch of READY array: {t*1e3:.2f} ms", flush=True)

    t = timeit(lambda: jax.block_until_ready(f(one)), 20)
    print(f"block_until_ready tiny: {t*1e3:.3f} ms", flush=True)

    # H2D bandwidth
    for mb in (1, 4, 16):
        x = np.random.randint(0, 255, mb << 20, dtype=np.uint8)
        t = timeit(lambda: jax.block_until_ready(jax.device_put(x)), 5)
        print(f"H2D {mb} MB: {t*1e3:.1f} ms = {mb/t:.0f} MB/s", flush=True)

    # D2H bandwidth
    for mb in (1, 4, 16):
        xd = jax.block_until_ready(jax.device_put(
            np.random.randint(0, 255, mb << 20, dtype=np.uint8)))
        t = timeit(lambda: np.asarray(xd), 5)
        print(f"D2H {mb} MB (ready): {t*1e3:.1f} ms = {mb/t:.0f} MB/s", flush=True)

    # on-device compute: big fused op with scalar output, no transfers
    N = 1 << 24  # 16M
    xd = jax.block_until_ready(jax.device_put(
        np.random.randint(0, 255, N, dtype=np.uint8)))

    g = jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32))[-1])
    t = timeit(lambda: jax.block_until_ready(g(xd)), 5)
    print(f"cumsum 16M + last (scalar out): {t*1e3:.2f} ms = {N/t/1e6:.0f} MB/s", flush=True)

    g2 = jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x.astype(jnp.int32))[-1])
    t = timeit(lambda: jax.block_until_ready(g2(xd)), 5)
    print(f"assoc_scan 16M (scalar out): {t*1e3:.2f} ms = {N/t/1e6:.0f} MB/s", flush=True)

    # does block_until_ready on LARGE output transfer? compare scalar-out vs array-out
    g3 = jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32)))
    t = timeit(lambda: jax.block_until_ready(g3(xd)), 5)
    print(f"cumsum 16M (64MB array out, block only): {t*1e3:.2f} ms", flush=True)

    # chained on-device ops: does chaining stay on device?
    def chain(x):
        y = g3(x)
        return jax.block_until_ready(jnp.max(y))
    t = timeit(lambda: chain(xd), 5)
    print(f"cumsum 16M then max (chained jits): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
