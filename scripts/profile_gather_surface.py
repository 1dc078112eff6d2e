"""Row-gather cost surface: (table rows) x (row width) on the real chip.

The stage-A word probe pays ~9.4 ms/MB (ablation-measured) for two
[P]-row gathers of 8-int rows from 2^17-row table halves. This measures
gather cost per output row across table sizes and row widths to pick the
cheapest exact-probe layout (narrow rows? smaller bucketized tables? both).

Protocol: tables and indices are jit ARGUMENTS (not constants — matches
production, where tables are closed-over device buffers but XLA treats
large constants as parameters), K repeated gathers inside one jit with
index rotation so the compiler cannot CSE them; cost = slope between K=4
and K=12 runs, i.e. per-gather marginal cost with dispatch/fetch excluded.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jtokkit_tpu.engine.device import enable_compile_cache

P = 1 << 18  # probe count (= one 1MB chunk's piece capacity)


def bench(rows_log2: int, width: int, k: int):
    @jax.jit
    def fn(table, idx):
        acc = jnp.zeros((P,), jnp.int32)
        for j in range(k):
            r = jnp.take(table, (idx + j) & (table.shape[0] - 1), axis=0,
                         mode="clip")
            acc = acc + r[:, 0] + r[:, width - 1]
        return jnp.sum(acc)  # scalar out: the [P] fetch would swamp timing

    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.randint(0, 1 << 30, size=(1 << rows_log2, width), dtype=np.int32)
    )
    idx = jnp.asarray(
        rng.randint(0, 1 << rows_log2, size=P, dtype=np.int32)
    )
    np.asarray(fn(table, idx))
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(fn(table, idx))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compile_cache()
    print("rows_log2 width  ns/row (slope K=4..12)", flush=True)
    for rl in (15, 16, 17, 18):
        for w in (1, 2, 4, 8, 16):
            t4 = bench(rl, w, 2)
            t12 = bench(rl, w, 34)
            slope = (t12 - t4) / 32 / P * 1e9
            print(f"  2^{rl:2d}  {w:4d}  {slope:7.2f}", flush=True)


if __name__ == "__main__":
    main()
