"""Measure gather cost vs table size, searchsorted, and Pallas VMEM gather."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=10):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


RT = None


def report(name, t, n_elems):
    comp = t - RT
    print(f"{name}: {t*1e3:.2f} ms total, ~{comp*1e3:.2f} ms compute, "
          f"{n_elems/max(comp,1e-9)/1e6:.0f} M elems/s", flush=True)


def main():
    global RT
    one = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    RT = timeit(lambda: f(one), 20)
    print(f"base latency: {RT*1e3:.2f} ms", flush=True)

    N = 1 << 20
    rng = np.random.default_rng(0)

    for tbl_size in (256, 2048, 1 << 14, 1 << 17, 1 << 20, 0x110000):
        tbl = jnp.asarray(rng.integers(0, 100, tbl_size, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, tbl_size, N, dtype=np.int32))
        g = jax.jit(lambda i, t: jnp.take(t, i).sum())
        t = timeit(lambda: g(idx, tbl))
        report(f"take int32 tbl={tbl_size}", t, N)

    # int8 table
    tbl8 = jnp.asarray(rng.integers(0, 100, 0x110000, dtype=np.int8))
    idx = jnp.asarray(rng.integers(0, 0x110000, N, dtype=np.int32))
    g8 = jax.jit(lambda i, t: jnp.take(t, i).astype(jnp.int32).sum())
    t = timeit(lambda: g8(idx, tbl8))
    report("take int8 tbl=1.1M", t, N)

    # 2D-shaped gather: same total elems, indices as [N/128, 128]
    idx2 = idx.reshape(-1, 128)
    g2 = jax.jit(lambda i, t: jnp.take(t, i).astype(jnp.int32).sum())
    t = timeit(lambda: g2(idx2, tbl8))
    report("take int8 2D idx", t, N)

    # searchsorted into 2048 boundaries
    bnd = jnp.asarray(np.sort(rng.integers(0, 0x110000, 2048).astype(np.int32)))
    q = idx
    ss = jax.jit(lambda b, x: jnp.searchsorted(b, x).astype(jnp.int32).sum())
    t = timeit(lambda: ss(bnd, q))
    report("searchsorted tbl=2048", t, N)

    bnd2 = jnp.asarray(np.sort(rng.integers(0, 0x110000, 256).astype(np.int32)))
    t = timeit(lambda: ss(bnd2, q))
    report("searchsorted tbl=256", t, N)

    # one-hot matmul lookup for 256-table: onehot [N,256] int8 @ tbl [256]
    tbl256 = jnp.asarray(rng.integers(0, 100, 256, dtype=np.int32))
    idxb = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))

    def onehot_lookup(i, t):
        oh = (i[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
        return jnp.where(oh, t[None, :], 0).sum(axis=1).sum()

    g3 = jax.jit(onehot_lookup)
    t = timeit(lambda: g3(idxb, tbl256))
    report("onehot-select tbl=256", t, N)

    # Pallas VMEM gather test
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TBL = 2048
        tblv = jnp.asarray(rng.integers(0, 100, TBL, dtype=np.int32))
        idxv = jnp.asarray(rng.integers(0, TBL, N, dtype=np.int32))

        def kern(idx_ref, tbl_ref, out_ref):
            out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def pal(i, t):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(i.shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(i, t)

        t = timeit(lambda: pal(idxv.reshape(-1, 128)[:4096], tblv))
        report("pallas take VMEM tbl=2048 (512K elems)", t, 4096 * 128)
    except Exception as e:
        print("pallas gather failed:", repr(e)[:500], flush=True)


if __name__ == "__main__":
    main()
