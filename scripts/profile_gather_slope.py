"""In-jit repetition slopes for the merge round primitives (tunnel-latency
free): row gathers with 2-D vs flat indices, 64K scalar gathers, 3-operand
axis-0 sort, colscan kernel launches."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jtokkit_tpu.ops import colscan


def slope(make_fn, reps=(2, 18)):
    f1 = jax.jit(make_fn(reps[0]))
    f2 = jax.jit(make_fn(reps[1]))
    def t(f):
        np.asarray(f().ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f().ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(f2) - t(f1)) / (reps[1] - reps[0])


def main():
    from jtokkit_tpu.engine.device import enable_compile_cache
    enable_compile_cache()
    rng = np.random.RandomState(0)
    T = 1 << 18
    rows = jnp.asarray(rng.randint(0, 1000, size=(T, 4)).astype(np.int32))
    small = jnp.asarray(rng.randint(-1, 100000, size=(65536,)).astype(np.int32))

    for (W, R) in ((384, 4096),):
        S = W * R
        idx2 = jnp.asarray(rng.randint(0, T, size=(W, R)).astype(np.int32))
        idxf = idx2.reshape(-1)
        sidx = jnp.asarray(rng.randint(0, 65536, size=(W, R)).astype(np.int32))
        x = jnp.asarray(rng.randint(0, 1 << 20, size=(W, R)).astype(np.int32))

        def mk_row2(n):
            def f():
                a = idx2
                for _ in range(n):
                    a = jnp.take(rows, a, axis=0, mode="clip")[..., 2] ^ 1
                return a
            return f
        def mk_rowf(n):
            def f():
                a = idxf
                for _ in range(n):
                    a = jnp.take(rows, a, axis=0, mode="clip")[..., 2] ^ 1
                return a
            return f
        def mk_scal(n):
            def f():
                a = sidx
                for _ in range(n):
                    a = jnp.abs(jnp.take(small, a, mode="clip")) & 0xFFFF
                return a
            return f
        def mk_sort(n):
            def f():
                a, b, c = x, x ^ 1, x ^ 2
                for _ in range(n):
                    a, b, c = jax.lax.sort((a, b, c), dimension=0, num_keys=1)
                    a = a ^ 1
                return a
            return f
        def mk_scan(n):
            def f():
                a = x
                for _ in range(n):
                    a = colscan.col_scan([a], ["last"])[0] - 1
                return a
            return f
        def mk_shift(n):
            def f():
                a = x
                for _ in range(n):
                    a = jnp.concatenate(
                        [jnp.full((1, R), -1, jnp.int32), a[:-1]], axis=0) + 1
                return a
            return f

        per_m = 1e9 / S  # ms per rep -> ns/elem is *1e6/S; report ms/1M elems
        import os as _os
        names = _os.environ.get("PRIMS", "row2,scal,sort").split(",")
        allp = {"row2": ("row gather 2d idx", mk_row2),
                "rowf": ("row gather flat idx", mk_rowf),
                "scal": ("64K scalar gather", mk_scal),
                "sort": ("sort3 axis0", mk_sort),
                "scan": ("colscan 1 leaf", mk_scan),
                "shift": ("shift (concat)", mk_shift)}
        for name, mk in [allp[k] for k in names]:
            s = slope(mk)
            print(f"[{W:4d}x{R}] {name:20s}: {s*1e3:7.3f} ms/rep "
                  f"({s*1e3/ (S/1e6):6.2f} ms/1M elem)", flush=True)
        print()


if __name__ == "__main__":
    main()
