"""Round-2 stage breakdown on the real chip: stage A / per-bucket merge /
stage C for each flavor, old merge vs exact merge."""

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


def sync(*xs):
    for x in xs:
        jax.tree.map(lambda a: np.asarray(jnp.asarray(a).ravel()[0]), x)


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
    print(f"chunks: {len(plan)}", flush=True)

    buf, doc_ends, parts, ascii_only, buf_dev, de_dev = plan[0]
    variant = "ascii" if ascii_only else "unicode"
    from jtokkit_tpu.engine.device import _DIVS_PRIMARY, _DIVS_PRIMARY_UNICODE
    divs = _DIVS_PRIMARY if ascii_only else _DIVS_PRIMARY_UNICODE
    sa = eng._stage_a(variant, divs)

    t = timeit(lambda: sync(sa(buf_dev, de_dev)[1]))
    print(f"stage A: {t*1e3:.1f} ms per {len(buf)/1e6:.2f} MB chunk", flush=True)

    table, meta = sa(buf_dev, de_dev)
    meta_h = np.asarray(meta)
    counts = meta_h[2:]
    print("bucket counts:", dict(zip(stage4.BUCKET_WIDTHS, counts.tolist())), flush=True)

    for b, lanes in enumerate(stage4.BUCKET_WIDTHS):
        cnt = int(counts[b])
        if cnt == 0:
            continue
        cap = eng._bucket_cap(len(buf), lanes, cnt)
        fn = eng._merge_bucket_fn(lanes, cap)

        def run():
            cols, outs = fn(
                buf_dev, table.starts, table.lens, table.miss_sorted,
                table.group_start[b], jnp.int32(cnt),
                eng._byte_to_id, eng._byte_pair_seed, eng._pair_rows0,
                eng._pair_rows1, eng.packed.table_mask,
            )
            sync(outs[-1][0])
        t = timeit(run)
        print(f"bucket {lanes:5d} cnt {cnt:6d} cap {cap:6d}: {t*1e3:7.2f} ms",
              flush=True)

    # end-to-end count + encode on the full plan
    texts = docs
    t = timeit(lambda: eng.count_tokens_corpus(texts, plan=plan))
    print(f"count_tokens_corpus: {t*1e3:.0f} ms -> {nbytes/1e6/t:.1f} MB/s", flush=True)
    t = timeit(lambda: eng.encode_ordinary_batch(texts), n=2)
    print(f"encode_ordinary_batch: {t*1e3:.0f} ms -> {nbytes/1e6/t:.1f} MB/s", flush=True)


if __name__ == "__main__":
    for flavor in sys.argv[1:] or ["english", "cjk"]:
        main(flavor)
