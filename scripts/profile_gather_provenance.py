"""Gather cost vs TABLE PROVENANCE: argument vs closed-over constant vs
computed-in-program, across table sizes.

Production evidence splits three ways: the stage-A word probe (closed-over
const halves, 2^17 x 8) pays ~8.2 ns/row; the masked_rows stitch (computed
[2^20, 7] table) pays ~2.9 ns/row; the first gather-surface microbench
(arg tables) pays ~2.5 ns/row at <=2^17 and ~11 at 2^18. Hypothesis: the
gather's cost is set by the table buffer's layout, which differs between
program constants, arguments, and in-program values. Whichever variant is
fast and available at production shapes decides how the engine should feed
its hash tables.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jtokkit_tpu.engine.device import enable_compile_cache

P = 1 << 18
K1, K2 = 2, 26


def slope(build):
    """build(k) -> (fn, args); returns ns/row marginal gather cost."""
    ts = []
    for k in (K1, K2):
        fn, args = build(k)
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (K2 - K1) / P * 1e9


def main():
    enable_compile_cache()
    rng = np.random.RandomState(0)

    for rl in (17, 18, 20):
        rows = 1 << rl
        tab_np = rng.randint(0, 1 << 30, size=(rows, 8), dtype=np.int32)
        tab = jnp.asarray(tab_np)
        idx = jnp.asarray(rng.randint(0, rows, size=P, dtype=np.int32))

        def loop(table, ix, k):
            acc = jnp.zeros((P,), jnp.int32)
            for j in range(k):
                r = jnp.take(table, (ix + j) & (rows - 1), axis=0,
                             mode="clip")
                acc = acc + r[:, 0] + r[:, 7]
            return jnp.sum(acc)

        def arg_build(k):
            fn = jax.jit(lambda t, ix: loop(t, ix, k))
            return fn, (tab, idx)

        def const_build(k):
            fn = jax.jit(lambda ix: loop(tab, ix, k))
            return fn, (idx,)

        def const_copy_build(k):
            def f(ix):
                t = tab + jnp.int32(0)  # force an in-program copy/layout
                return loop(t, ix, k)
            return jax.jit(f), (idx,)

        def arg_copy_build(k):
            def f(t, ix):
                return loop(t + jnp.int32(0), ix, k)
            return jax.jit(f), (tab, idx)

        print(f"rows=2^{rl}:", flush=True)
        for name, b in (("arg", arg_build), ("const", const_build),
                        ("const+copy", const_copy_build),
                        ("arg+copy", arg_copy_build)):
            print(f"  {name:10s} {slope(b):6.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
