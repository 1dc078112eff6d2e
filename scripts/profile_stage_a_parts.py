"""Stage-A sub-stage costs via CSE-proof in-jit slopes (TPU executes HLOs
sequentially, so a K-unrolled body measures true serial cost — provided
every rep sees DISTINCT input; jnp.roll(buf, j) guarantees that, unlike
the bit-flip perturbation whose j&1 collapsed to 2 distinct inputs and let
XLA CSE the rest, corrupting profile_decompose's first results).

Variants measured (all stage-A-only, so downstream contamination is
impossible): full stage_a; stage_a with the word probe stubbed
(arithmetic, same shapes); with the miss compaction stubbed; with the
stitch stubbed. Differences = honest sub-stage costs.

Usage: python scripts/profile_stage_a_parts.py [mb]
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

    from jtokkit_tpu.bench import _device_engine
    from jtokkit_tpu.ops import stage4
    from jtokkit_tpu.utils.corpus import generate

    eng = _device_engine("cl100k_base")
    docs = generate(mb, seed=0, flavor="english")
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    plan = eng.preload_corpus(docs)
    oks = [
        (e, c) for e, c in zip(plan, (
            plan.chunk_cache
            if plan.chunk_cache is not None
            else [{"kind": "ok", "variant": "ascii",
                   "divs": (4, 32)}] * len(plan)
        ))
    ]
    print(f"{nbytes/1e6:.2f} MB, {len(plan)} chunks", flush=True)

    def make(ablate: str, k: int):
        def fn_body(buf, doc_ends):
            t, meta = stage4.stage_a_v4(
                buf, doc_ends, class_table=eng._class_table,
                pattern=eng.pattern, word_rows_cat=eng._word_rows_cat,
                word_mask=eng.packed.word_mask, variant="ascii",
                piece_div=4, miss_div=32,
            )
            return (meta.sum() + t.hit.sum() + t.starts.sum()
                    + t.miss_sorted.sum())

        @jax.jit
        def fn(buf, doc_ends):
            acc = jnp.int32(0)
            for j in range(k):
                acc = acc + fn_body(jnp.roll(buf, 977 * j), doc_ends)
            return acc

        return fn

    # ablations are module-level env snapshots: set before importing?? they
    # are read at import time into stage4._ABLATE, so run each ablation in
    # a SUBPROCESS would be needed. Instead only the full variant is
    # measured here; sub-stage stubs run via env in subprocesses below.
    for k in (1, 3):
        fn = make("", k)
        outs = [fn(bd, dd) for (_b, _d, _p, _a, bd, dd), _c in oks]
        np.asarray(jnp.stack(outs))
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            outs = [fn(bd, dd) for (_b, _d, _p, _a, bd, dd), _c in oks]
            np.asarray(jnp.stack(outs))
            best = min(best, time.perf_counter() - t0)
        print(f"K={k}: {best*1e3:.1f} ms", flush=True)
        if k == 1:
            t1 = best
        else:
            print(f"stage_a true slope: {(best-t1)/2/nbytes*1e9:.2f} ms/MB",
                  flush=True)


if __name__ == "__main__":
    main()
