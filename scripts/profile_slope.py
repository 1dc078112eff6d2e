"""Ground-truth per-op cost via in-jit repetition slope.

For each candidate op f, build jit(fori_loop(0, K, dep-chained f)) and time
K=2 vs K=18; slope = (t18 - t2) / 16 = true per-iteration device time,
immune to dispatch/queue/transfer noise.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, n=3):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_body, x, extra=None):
    """make_body(acc_scalar, x, extra) -> new scalar; returns per-iter ms."""
    def run(K):
        @jax.jit
        def g(x, e):
            def body(i, acc):
                return make_body(acc + i, x, e)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return wall(lambda: g(x, extra))
    t2, t18 = run(2), run(18)
    return (t18 - t2) / 16 * 1e3


def main():
    N = 1 << 20
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.integers(0, 128, N).astype(np.uint8))
    idx = jnp.asarray(rng.integers(0, 0x110000, N).astype(np.int32))
    ct = jnp.asarray(rng.integers(0, 7, 0x110000).astype(np.int8))
    small = jnp.asarray(rng.integers(0, 7, 2048).astype(np.int32))
    idx_small = jnp.asarray(rng.integers(0, 2048, N).astype(np.int32))

    print(f"N = {N}", flush=True)

    # 1. elementwise chain (5 wheres)
    def ew(acc, x, e):
        y = x.astype(jnp.int32) + acc
        for _ in range(5):
            y = jnp.where(y > 64, y - 1, y + 1)
        return y.sum()
    print(f"5x where chain: {slope(ew, buf):.3f} ms", flush=True)

    # 2. big-table gather
    def big_gather(acc, i, e):
        return jnp.take(e, jnp.bitwise_xor(i, acc & 1), mode="clip").astype(jnp.int32).sum()
    print(f"gather 1.1M-table: {slope(big_gather, idx, ct):.3f} ms", flush=True)

    # 3. small-table gather (2048 int32)
    def small_gather(acc, i, e):
        return jnp.take(e, jnp.bitwise_xor(i, acc & 1), mode="clip").sum()
    print(f"gather 2K-table: {slope(small_gather, idx_small, small):.3f} ms", flush=True)

    # 4. 256-table gather
    t256 = jnp.asarray(rng.integers(0, 7, 256).astype(np.int32))
    idx256 = jnp.asarray(rng.integers(0, 256, N).astype(np.int32))
    print(f"gather 256-table: {slope(small_gather, idx256, t256):.3f} ms", flush=True)

    # 5. cummax scan
    def scan_max(acc, x, e):
        return jax.lax.associative_scan(jnp.maximum, x.astype(jnp.int32) + acc)[-1]
    print(f"assoc_scan max: {slope(scan_max, buf):.3f} ms", flush=True)

    # 6. cumsum
    def scan_sum(acc, x, e):
        return jnp.cumsum(x.astype(jnp.int32) + acc)[-1]
    print(f"cumsum: {slope(scan_sum, buf):.3f} ms", flush=True)

    # 7. bool shift chain (concatenate-based)
    def bool_shifts(acc, x, e):
        m = (x.astype(jnp.int32) + acc) > 64
        for k in (1, 2, 3):
            m = m | jnp.concatenate([jnp.zeros((k,), jnp.bool_), m[:-k]])
        return m.sum().astype(jnp.int32)
    print(f"bool shift chain: {slope(bool_shifts, buf):.3f} ms", flush=True)

    # 8. nonzero (size-bounded compaction)
    def nz(acc, x, e):
        m = (x.astype(jnp.int32) + acc) % 7 == 0
        return jnp.nonzero(m, size=N // 2, fill_value=N)[0].astype(jnp.int32).sum()
    print(f"nonzero size=N/2: {slope(nz, buf):.3f} ms", flush=True)

    # 9. argsort int32 over N/8
    key = jnp.asarray(rng.integers(0, 6, N // 8).astype(np.int32))
    def srt(acc, x, e):
        return jnp.argsort(x + acc, stable=True).astype(jnp.int32).sum()
    print(f"argsort N/8: {slope(srt, key):.3f} ms", flush=True)

    # 10. searchsorted N queries into 2048
    bnd = jnp.asarray(np.sort(rng.integers(0, 0x110000, 2048).astype(np.int32)))
    def ss(acc, x, e):
        return jnp.searchsorted(e, jnp.bitwise_xor(x, acc & 1)).astype(jnp.int32).sum()
    print(f"searchsorted 2K: {slope(ss, idx, bnd):.3f} ms", flush=True)

    # 11. one-hot select 256-table (VPU, no gather)
    def oh(acc, x, e):
        i = jnp.bitwise_xor(x, acc & 1)
        sel = (i[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
        return jnp.where(sel, e[None, :], 0).sum()
    print(f"onehot-select 256: {slope(oh, idx256, t256):.3f} ms", flush=True)

    # 12. gather with 2D [8192,128] index shape, big table
    idx2 = idx.reshape(-1, 128)
    def big_gather2(acc, i, e):
        return jnp.take(e, jnp.bitwise_xor(i, acc & 1), mode="clip").astype(jnp.int32).sum()
    print(f"gather 1.1M-table 2D idx: {slope(big_gather2, idx2, ct):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
