"""Breakdown profiling of the device pipeline on the real chip.

Measures: tunnel round-trip latency, stage-A throughput, per-bucket merge
cost, and end-to-end count_tokens_corpus at several chunk sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks
    from jtokkit_tpu.utils.corpus import generate

    print("devices:", jax.devices(), flush=True)

    # 1. bare round-trip latency
    one = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(one))
    rt = timeit(lambda: np.asarray(f(one)), 20)
    print(f"round-trip (tiny jit + sync): {rt*1e3:.2f} ms", flush=True)

    # dispatch-only cost (no sync)
    def disp():
        y = f(one)
    dt = timeit(disp, 20)
    print(f"dispatch only: {dt*1e3:.2f} ms", flush=True)

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)

    docs = generate(8, seed=0, flavor="english")
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    print(f"corpus: {nbytes/1e6:.2f} MB, {len(docs)} docs", flush=True)

    # 2. end-to-end count at current chunk size
    t = timeit(lambda: eng.count_tokens_corpus(docs), 3)
    print(f"count_tokens_corpus: {t:.3f}s = {nbytes/t/1e6:.1f} MB/s", flush=True)

    # 3. stage A alone (dispatch all, sync all metas)
    plan = list(eng._plan_chunks(docs))
    print(f"chunks: {len(plan)}, sizes: {[len(p[0]) for p in plan[:4]]}...", flush=True)

    bufs = [(jnp.asarray(b), jnp.asarray(v), jnp.asarray(de)) for b, v, de, _ in plan]

    def stage_a_all():
        metas = []
        for b, v, de in bufs:
            _t, meta = eng._stage_a_fn(b, v, de)
            metas.append(meta)
        return [np.asarray(m) for m in metas]

    t = timeit(stage_a_all, 3)
    print(f"stage A all chunks: {t:.3f}s = {nbytes/t/1e6:.1f} MB/s", flush=True)

    # 4. full pipeline but without want_tokens (same as count) per-phase timing
    t0 = time.perf_counter()
    results = eng._process_chunks(docs, want_tokens=False)
    total = sum(int(r[3]) for r in results if r[0] == "ok")
    t_full = time.perf_counter() - t0
    print(f"process_chunks(count): {t_full:.3f}s, tokens={total}", flush=True)

    # 5. bucket stats from one chunk
    b, v, de = bufs[0]
    table, meta = eng._stage_a_fn(b, v, de)
    meta_np = np.asarray(meta)
    print(f"chunk0 meta: overflow={meta_np[0]} n_pieces={meta_np[1]} bucket_counts={meta_np[2:]}", flush=True)

    # 6. merge bucket timing for chunk0
    from jtokkit_tpu.ops import pipeline as pl_ops
    N = len(np.asarray(b))
    for bi, lanes in enumerate(pl_ops.BUCKET_WIDTHS):
        cnt = int(meta_np[2 + bi])
        if cnt == 0:
            continue
        cap = eng._bucket_cap(N, lanes, cnt)
        fn = eng._merge_bucket_fn(lanes, cap)
        def run():
            cols, ids, active = fn(
                b, table.starts, table.lens, table.miss_sorted,
                table.group_start[bi], jnp.int32(cnt),
                eng._byte_to_id, eng._byte_pair_id, eng._cuckoo_u,
                eng._cuckoo_v, eng._cuckoo_id, eng.packed.table_mask,
            )
            jax.block_until_ready(ids)
        t = timeit(run, 3)
        print(f"bucket lanes={lanes} cnt={cnt} cap={cap}: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
