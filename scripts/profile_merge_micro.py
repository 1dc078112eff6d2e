"""Microbench: colscan kernel, one general round, old-vs-new bucket merge."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.ops import colscan, merge, merge_exact
from jtokkit_tpu.vocab import tables as vtables
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks


def timeit(fn, n=5):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def sync(x):
    np.asarray(jnp.asarray(x).ravel()[0])


def main():
    d = BUILTIN_DEFINITIONS["cl100k_base"]
    ranks = load_builtin_ranks(d.vocab_name)
    packed = vtables.load_packed("cl100k_base", ranks, asset_path("cl100k_base"))
    rows0 = jnp.asarray(np.stack(
        [packed.cuckoo_u[0], packed.cuckoo_v[0], packed.cuckoo_id[0],
         packed.cuckoo_safe[0]], axis=1))
    rows1 = jnp.asarray(np.stack(
        [packed.cuckoo_u[1], packed.cuckoo_v[1], packed.cuckoo_id[1],
         packed.cuckoo_safe[1]], axis=1))
    byte_to_id = jnp.asarray(packed.byte_to_id)
    seed_t = jnp.asarray(packed.byte_pair_seed)
    mask = packed.table_mask

    rng = np.random.RandomState(0)
    for (W, R) in ((16, 8192), (64, 2048), (384, 4096)):
        S = W * R
        mat = rng.randint(97, 122, size=(W, R)).astype(np.uint8)
        lens = np.full((R,), W, np.int32)
        ids = jnp.asarray(np.take(packed.byte_to_id, mat.astype(np.int64)))
        lenc = jnp.ones((W, R), jnp.int32)
        off = jnp.asarray(np.arange(W, dtype=np.int32)[:, None] * np.ones((1, R), np.int32))
        active = jnp.ones((W, R), bool)

        # colscan single launch (1 leaf and 2 leaves)
        f1 = jax.jit(lambda x: colscan.col_scan([x], ["last"])[0])
        t = timeit(lambda: sync(f1(ids)))
        print(f"[{W}x{R}] colscan 1 leaf: {t*1e3:6.2f} ms ({t/S*1e9:.1f} ns/elem)")
        f2 = jax.jit(lambda x: colscan.col_scan([x, x], ["last", "last"])[0])
        t = timeit(lambda: sync(f2(ids)))
        print(f"[{W}x{R}] colscan 2 leaf: {t*1e3:6.2f} ms")
        f1x = jax.jit(lambda x: colscan.col_scan([x], ["last"], enabled=False)[0])
        t = timeit(lambda: sync(f1x(ids)))
        print(f"[{W}x{R}] assoc-scan 1 leaf: {t*1e3:6.2f} ms")

        # one general round
        fr = jax.jit(lambda i, l, o, a: merge_exact._general_round(
            i, l, o, a, rows0, rows1, mask)[0])
        t = timeit(lambda: sync(fr(ids, lenc, off, active)))
        print(f"[{W}x{R}] general round: {t*1e3:6.2f} ms")

        # round1
        fb = jax.jit(lambda m, l: merge_exact.round1_bytes(
            m, l, byte_to_id, seed_t)[0])
        t = timeit(lambda: sync(fb(jnp.asarray(mat), jnp.asarray(lens))))
        print(f"[{W}x{R}] round1 bytes: {t*1e3:6.2f} ms")

        # compact
        fc = jax.jit(lambda i, l, o, a: merge_exact._compact(i, l, o, a, W // 2)[0])
        t = timeit(lambda: sync(fc(ids, lenc, off, active)))
        print(f"[{W}x{R}] compact: {t*1e3:6.2f} ms")

        # pair lookup alone
        fp = jax.jit(lambda u, v: merge_exact.pair_lookup_safe(u, v, rows0, rows1, mask)[0])
        t = timeit(lambda: sync(fp(ids, ids)))
        print(f"[{W}x{R}] 1 pair lookup: {t*1e3:6.2f} ms")

        # OLD merge for comparison (full while loop)
        fo = jax.jit(lambda m, l: merge.merge_rows_t2(
            m, l, byte_to_id, jnp.asarray(packed.byte_pair_id),
            rows0, rows1, mask)[0])
        t = timeit(lambda: sync(fo(jnp.asarray(mat), jnp.asarray(lens))), n=2)
        print(f"[{W}x{R}] OLD full merge loop: {t*1e3:6.2f} ms")

        # NEW full bucket merge
        buf = jnp.asarray(mat.T.reshape(-1))
        starts = jnp.asarray((np.arange(R) * W).astype(np.int32))
        lens_j = jnp.asarray(lens)
        ms = jnp.asarray(np.arange(R, dtype=np.int32))
        fn = jax.jit(lambda: merge_exact.merge_bucket_exact(
            buf, starts, lens_j, ms, jnp.int32(0), jnp.int32(R),
            byte_to_id, seed_t, rows0, rows1, mask, lanes=W, cap=R))
        t = timeit(lambda: sync(fn()[1][-1][0]), n=2)
        print(f"[{W}x{R}] NEW full bucket merge: {t*1e3:6.2f} ms")
        print()


if __name__ == "__main__":
    main()
