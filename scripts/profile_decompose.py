"""Honest in-context decomposition of the count pipeline via in-jit slopes.

The JTOKKIT_TPU_ABLATE stubs change downstream work (an all-hit word probe
empties the merge buckets), so their deltas conflate stages. Here each
variant runs the REAL code for a prefix of the pipeline (stage A; stage A +
merges; full count), repeated K times inside ONE jit on per-rep perturbed
inputs (so XLA cannot CSE the repeats), returning one scalar. Cost of a
prefix = time slope between K=1 and K=3; stage costs are slope differences.
Dispatch and tunnel latency cancel in the slope.

Usage: python scripts/profile_decompose.py [mb] [flavor]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8
    flavor = sys.argv[2] if len(sys.argv) > 2 else "english"

    from jtokkit_tpu.bench import _device_engine
    from jtokkit_tpu.ops import pipeline, stage4
    from jtokkit_tpu.utils.corpus import generate

    eng = _device_engine("cl100k_base")
    docs = generate(mb, seed=0, flavor=flavor)
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    plan = eng.preload_corpus(docs)
    total = eng.count_tokens_corpus(docs, plan=plan)  # warm + plan cache
    print(f"{nbytes/1e6:.2f} MB {flavor}, {len(plan)} chunks, "
          f"{total} tokens", flush=True)
    t0 = time.perf_counter()
    eng.count_tokens_corpus(None, plan=plan)
    base = time.perf_counter() - t0
    for _ in range(3):
        t0 = time.perf_counter()
        eng.count_tokens_corpus(None, plan=plan)
        base = min(base, time.perf_counter() - t0)
    print(f"steady count (staged or fused per engine default): "
          f"{base*1e3:.1f} ms = {nbytes/base/1e6:.1f} MB/s", flush=True)

    oks = [
        (e, c) for e, c in zip(plan, plan.chunk_cache) if c["kind"] == "ok"
    ]

    def make(variant, divs, sig, upto: str, k: int):
        """One jit running the pipeline prefix K times on perturbed bufs."""

        def body(buf, doc_ends):
            table, meta = stage4.stage_a_v4(
                buf, doc_ends, class_table=eng._class_table,
                pattern=eng.pattern, word_rows_cat=eng._word_rows_cat,
                word_mask=eng.packed.word_mask, variant=variant,
                piece_div=divs[0], miss_div=divs[1],
            )
            if upto == "stage_a":
                return meta.sum() + table.hit.sum() + table.starts.sum()
            counts = pipeline.counts_init(table.hit, table.n_pieces)
            for (b, lanes, cap) in sig:
                cols, ids, active = pipeline.merge_bucket_v3(
                    buf, table.starts, table.lens, table.miss_sorted,
                    table.group_start[b], table.bucket_counts[b],
                    eng._byte_to_id, eng._byte_pair_id, eng._pair_rows_cat,
                    eng.packed.table_mask, lanes=lanes, cap=cap,
                )
                counts = pipeline.counts_add_bucket(counts, cols, active)
            if upto == "merges":
                return counts.sum()
            offsets, n_tokens = pipeline.make_offsets(
                counts, table.n_pieces
            )
            doc_counts = stage4.doc_token_counts_v4(
                offsets, n_tokens, table.starts, doc_ends, table.n_pieces
            )
            return n_tokens + doc_counts.sum()

        @jax.jit
        def fn(buf, doc_ends):
            acc = jnp.int32(0)
            for j in range(k):
                # flip bit 1 of letter bytes on odd reps: content-level
                # perturbation that defeats CSE but keeps classes ~stable
                b = buf ^ jnp.uint8(2 * (j & 1))
                acc = acc + body(b, doc_ends)
            return acc

        return fn

    def timed(upto, k):
        fns = []
        for (buf, de, parts, _a, buf_dev, de_dev), c in oks:
            sig = tuple((b, l, cp) for (b, l, cp, _c) in c["caps"])
            fns.append(
                (make(c["variant"], c["divs"], sig, upto, k),
                 buf_dev, de_dev)
            )
        outs = [fn(b, d) for fn, b, d in fns]  # compile
        np.asarray(jnp.stack(outs))  # ONE fetch: per-chunk fetches would
        best = float("inf")          # add 17x22 ms of latency noise
        for _ in range(6):
            t0 = time.perf_counter()
            outs = [fn(b, d) for fn, b, d in fns]
            np.asarray(jnp.stack(outs))
            best = min(best, time.perf_counter() - t0)
        return best

    rows = {}
    for upto in ("stage_a", "merges", "count"):
        t1 = timed(upto, 1)
        t3 = timed(upto, 5)
        slope = (t3 - t1) / 4
        rows[upto] = slope
        print(f"{upto:8s}: slope {slope*1e3:7.1f} ms "
              f"({slope/nbytes*1e9:.2f} ms/MB, K1 {t1*1e3:.1f} K3 {t3*1e3:.1f})",
              flush=True)
    print(f"merges alone: {(rows['merges']-rows['stage_a'])*1e3:.1f} ms; "
          f"stage C alone: {(rows['count']-rows['merges'])*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
