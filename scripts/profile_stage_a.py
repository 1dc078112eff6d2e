"""Time individual sub-ops of stage A on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks
    from jtokkit_tpu.utils.corpus import generate
    from jtokkit_tpu.ops import classify, boundaries

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)

    docs = generate(2, seed=0, flavor="english")
    plan = list(eng._plan_chunks(docs))
    buf_np, valid_np, doc_ends_np, _ = plan[0]
    N = len(buf_np)
    print(f"N = {N}", flush=True)
    buf = jnp.asarray(buf_np)
    valid = jnp.asarray(valid_np)
    doc_ends = jnp.asarray(doc_ends_np)

    ct = eng._class_table

    f_classify = jax.jit(lambda b, v: classify.classify_bytes(b, ct, v))
    t = timeit(lambda: f_classify(buf, valid))
    print(f"classify_bytes: {t*1e3:.2f} ms ({N/t/1e6:.0f} MB/s)", flush=True)

    info = jax.block_until_ready(f_classify(buf, valid))

    f_bound = jax.jit(lambda i: boundaries.piece_starts(i, eng.pattern))
    t = timeit(lambda: f_bound(info))
    print(f"piece_starts: {t*1e3:.2f} ms", flush=True)

    mask = jax.block_until_ready(f_bound(info))

    P = N // 2
    f_nonzero = jax.jit(lambda m: jnp.nonzero(m, size=P, fill_value=N)[0].astype(jnp.int32))
    t = timeit(lambda: f_nonzero(mask))
    print(f"nonzero(size=N/2): {t*1e3:.2f} ms", flush=True)

    starts = jax.block_until_ready(f_nonzero(mask))

    # gather-only: class-table take
    cp = jnp.clip(buf.astype(jnp.int32) * 1000, 0, 0x10FFFF)
    f_take = jax.jit(lambda c: jnp.take(ct, c, mode="clip").astype(jnp.int32).sum())
    t = timeit(lambda: f_take(cp))
    print(f"take(class_table 1.1MB, N): {t*1e3:.2f} ms", flush=True)

    # small-table take (64K)
    f_take2 = jax.jit(lambda b: jnp.take(eng._byte_pair_id, b.astype(jnp.int32) * 256 + 7).sum())
    t = timeit(lambda: f_take2(buf))
    print(f"take(byte_pair 256KB, N): {t*1e3:.2f} ms", flush=True)

    # associative scan
    f_scan = jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x))
    xi = jnp.arange(N, dtype=jnp.int32)
    t = timeit(lambda: f_scan(xi))
    print(f"assoc_scan(max, N): {t*1e3:.2f} ms", flush=True)

    # cumsum
    f_cs = jax.jit(lambda x: jnp.cumsum(x))
    t = timeit(lambda: f_cs(xi))
    print(f"cumsum(N): {t*1e3:.2f} ms", flush=True)

    # argsort over M = N//8
    M = N // 8
    key = jnp.asarray(np.random.randint(0, 6, size=M).astype(np.int32))
    f_sort = jax.jit(lambda k: jnp.argsort(k, stable=True))
    t = timeit(lambda: f_sort(key))
    print(f"argsort(M=N/8): {t*1e3:.2f} ms", flush=True)

    # searchsorted doc ends
    f_ss = jax.jit(lambda de, s: jnp.searchsorted(de, s, side="right").astype(jnp.int32))
    t = timeit(lambda: f_ss(doc_ends, starts))
    print(f"searchsorted(doc_ends, P): {t*1e3:.2f} ms", flush=True)

    # full stage A for reference
    t = timeit(lambda: eng._stage_a_fn(buf, valid, doc_ends))
    print(f"stage_a full: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
