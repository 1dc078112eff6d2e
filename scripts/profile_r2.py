"""Round-2 stage breakdown on the real chip: stage A / merge buckets / stage C,
for english and cjk flavors, plus honest encode (tokens materialized)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def sync(x):
    return np.asarray(jnp.asarray(x).ravel()[0])


def main(flavor="english", mb=4):
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.ops import stage4
    from jtokkit_tpu.utils.corpus import generate
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)

    docs = generate(mb, seed=0, flavor=flavor)
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    print(f"=== {flavor}: {nbytes/1e6:.2f} MB ===", flush=True)

    plan = eng.preload_corpus(docs)
    chunk_mb = sum(len(p[0]) for p in plan) / 1e6
    print(f"chunks: {len(plan)} ({chunk_mb:.1f} MB padded)", flush=True)

    # stage A
    buf, doc_ends, parts, ascii_only, buf_dev, de_dev = plan[0]
    variant = "ascii" if ascii_only else "unicode"
    from jtokkit_tpu.engine import device as dev_mod
    divs = dev_mod._DIVS_PRIMARY if ascii_only else dev_mod._DIVS_PRIMARY_UNICODE
    fn_a = eng._stage_a(variant, divs)

    def stage_a_one():
        t, meta = fn_a(buf_dev, de_dev)
        sync(meta)

    t = timeit(stage_a_one)
    print(f"stage A ({variant}): {t*1e3:.1f} ms/chunk = {len(buf)/t/1e6:.0f} MB/s", flush=True)

    table, meta = fn_a(buf_dev, de_dev)
    meta_np = np.asarray(meta)
    print(f"meta: overflow={meta_np[0]} n_pieces={meta_np[1]} buckets={dict(zip(stage4.BUCKET_WIDTHS, meta_np[2:]))}", flush=True)

    # per-bucket merge
    N = len(buf)
    tot_merge = 0.0
    for bi, lanes in enumerate(stage4.BUCKET_WIDTHS):
        cnt = int(meta_np[2 + bi])
        if cnt == 0:
            continue
        cap = eng._bucket_cap(N, lanes, cnt)
        fn = eng._merge_bucket_fn(lanes, cap)

        def run():
            cols, ids, active = fn(
                buf_dev, table.starts, table.lens, table.miss_sorted,
                table.group_start[bi], jnp.int32(cnt),
                eng._byte_to_id, eng._byte_pair_id, eng._pair_rows0,
                eng._pair_rows1, eng.packed.table_mask,
            )
            sync(active.sum())

        t = timeit(run)
        tot_merge += t
        print(f"bucket w={lanes} cnt={cnt} cap={cap}: {t*1e3:.1f} ms", flush=True)
    print(f"merge total: {tot_merge*1e3:.1f} ms/chunk", flush=True)

    # stage C (counts/offsets/doc counts; no scatters)
    def stage_c():
        counts = eng._counts_init(table.hit, table.n_pieces)
        offsets, n_tokens = eng._make_offsets(counts, table.n_pieces)
        dc = eng._doc_counts(offsets, n_tokens, table.starts, de_dev, table.n_pieces)
        sync(dc)

    t = timeit(stage_c)
    print(f"stage C (no merge adds, no scatters): {t*1e3:.1f} ms/chunk", flush=True)

    # end-to-end count + encode
    t = timeit(lambda: eng.count_tokens_corpus(docs, plan=plan))
    print(f"count_tokens_corpus: {t:.3f}s = {nbytes/t/1e6:.1f} MB/s", flush=True)
    t = timeit(lambda: eng.encode_ordinary_batch(docs), 2)
    print(f"encode_ordinary_batch: {t:.3f}s = {nbytes/t/1e6:.1f} MB/s", flush=True)


if __name__ == "__main__":
    flavor = sys.argv[1] if len(sys.argv) > 1 else "english"
    mb = float(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(flavor, mb)
