"""Row-gather cost structure on the real chip: width x row-count x layout.

Decides the word-probe redesign: the stage-A probe is a [2, P, 8] row
gather (~7 ms at P=262144, the dominant stage-A cost). If gather cost is
per ELEMENT, a [2, P, 4] probe halves it; if per ROW, narrowing is free of
benefit. Also measures stacked-index vs separate gathers and scalar
gathers for the same row count.

In-jit repetition slope protocol (dispatch/tunnel noise cancels), as in
scripts/profile_slope.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 262144
T = 1 << 18  # word-table-sized


def slope(make_fn, reps=(4, 12)):
    """Per-iteration cost from two in-jit repetition counts."""
    times = []
    for r in reps:
        fn = jax.jit(make_fn(r))
        np.asarray(fn())  # compile+warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (reps[1] - reps[0])


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (2, P), 0, 2 * T, dtype=jnp.int32)
    idx1 = idx[0] % T
    # random fill: zero tables would let XLA constant-fold the gathers away
    kt = jax.random.PRNGKey(1)
    rows8 = jax.random.randint(kt, (2 * T, 8), 0, 1 << 30, dtype=jnp.int32)
    rows4 = rows8[:, :4]
    rows2 = rows8[:, :2]
    flat = rows8[:, 0]

    def bench(name, make):
        t = slope(make)
        print(f"{name:42s}: {t*1e3:7.3f} ms/iter", flush=True)

    def mk(table, indices):
        def make(r):
            def fn():
                # chain iterations through a data dependency so XLA cannot
                # overlap the repeated gathers (else the slope vanishes)
                acc = jnp.int32(0)
                for k in range(r):
                    ix = (indices + k + (acc & 1)) % (2 * T)
                    g = jnp.take(table, ix, axis=0)
                    acc = acc + g.sum()
                return acc
            return fn
        return make

    bench("[2,P] rows of 8  (stacked probe)", mk(rows8, idx))
    bench("[2,P] rows of 4", mk(rows4, idx))
    bench("[2,P] rows of 2", mk(rows2, idx))
    bench("[P]   rows of 8  (one probe)", mk(rows8, idx1))
    bench("[P]   rows of 4", mk(rows4, idx1))
    bench("[P]   scalar gather", mk(flat, idx1))

    # small-table variant: does table residency matter?
    S = 1 << 14
    rows8s = rows8[:S]
    idxs = idx % S
    bench("[2,P] rows of 8, 16K-row table", mk(rows8s, idxs))


if __name__ == "__main__":
    main()
