"""Pure on-device compute time of the pipeline stages (scalar-out, no D2H)."""

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
    from jtokkit_tpu.ops import pipeline as pl_ops, classify, boundaries

    one = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    rt = timeit(lambda: f(one), 10)
    print(f"RTT: {rt*1e3:.2f} ms", flush=True)

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)

    docs = generate(2, seed=0, flavor="english")
    plan = list(eng._plan_chunks(docs))
    buf_np, valid_np, doc_ends_np, _ = plan[0]
    N = len(buf_np)
    print(f"N = {N}", flush=True)
    buf = jax.block_until_ready(jnp.asarray(buf_np))
    valid = jax.block_until_ready(jnp.asarray(valid_np))
    doc_ends = jax.block_until_ready(jnp.asarray(doc_ends_np))

    ct = eng._class_table

    # stage A with all outputs reduced to one scalar (no D2H of arrays)
    @jax.jit
    def stage_a_scalar(b, v, de):
        t, meta = pl_ops.stage_a(
            b, v, de, ct, eng.pattern,
            eng._word_w0, eng._word_w1, eng._word_lenid, eng.packed.word_mask,
        )
        return (t.starts.sum() + t.lens.sum() + t.hit.sum() + t.doc_of.sum()
                + t.miss_sorted.sum() + meta.sum())

    t = timeit(lambda: stage_a_scalar(buf, valid, doc_ends))
    print(f"stage A (scalar out): {t*1e3:.2f} ms -> compute ~{(t-rt)*1e3:.2f} ms "
          f"= {N/max(t-rt,1e-9)/1e6:.0f} MB/s", flush=True)

    # classify alone scalar
    @jax.jit
    def classify_scalar(b, v):
        info = classify.classify_bytes(b, ct, v)
        return info["cls"].sum()
    t = timeit(lambda: classify_scalar(buf, valid))
    print(f"classify (scalar out): {(t-rt)*1e3:.2f} ms compute", flush=True)

    @jax.jit
    def bound_scalar(b, v):
        info = classify.classify_bytes(b, ct, v)
        return boundaries.piece_starts(info, eng.pattern).sum()
    t = timeit(lambda: bound_scalar(buf, valid))
    print(f"classify+piece_starts (scalar out): {(t-rt)*1e3:.2f} ms compute", flush=True)

    # stage A for real (device outputs), then meta fetch — what the engine does
    tt, meta = eng._stage_a_fn(buf, valid, doc_ends)
    meta_np = np.asarray(meta)
    print(f"meta: {meta_np}", flush=True)

    # merge bucket scalar-out
    for bi, lanes in enumerate(pl_ops.BUCKET_WIDTHS):
        cnt = int(meta_np[2 + bi])
        if cnt == 0:
            continue
        cap = eng._bucket_cap(N, lanes, cnt)

        @jax.jit
        def merge_scalar(b, starts, lens, ms, gs, c):
            cols, ids, active = pl_ops.merge_bucket(
                b, starts, lens, ms, gs, c,
                eng._byte_to_id, eng._byte_pair_id, eng._cuckoo_u,
                eng._cuckoo_v, eng._cuckoo_id, eng.packed.table_mask,
                lanes=lanes, cap=cap,
            )
            return ids.sum() + active.sum() + cols.sum()

        t = timeit(lambda: merge_scalar(
            buf, tt.starts, tt.lens, tt.miss_sorted,
            tt.group_start[bi], jnp.int32(cnt)))
        print(f"merge bucket lanes={lanes} cnt={cnt} cap={cap}: "
              f"{(t-rt)*1e3:.2f} ms compute", flush=True)


if __name__ == "__main__":
    main()
