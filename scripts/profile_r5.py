"""Round-5 on-chip breakdown of the steady-state count pipeline.

Times, per chunk of the plan: stage A, each merge bucket (with its real
cap/count), and stage C — plus the end-to-end steady-state count pass.
Timing is forced with np.asarray on a small output (the axon tunnel's
block_until_ready is unreliable).

Usage: python scripts/profile_r5.py [mb] [flavor] [encoding]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, n=6):
    np.asarray(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8
    flavor = sys.argv[2] if len(sys.argv) > 2 else "english"
    encoding = sys.argv[3] if len(sys.argv) > 3 else "cl100k_base"

    from jtokkit_tpu.bench import _device_engine, _oracle
    from jtokkit_tpu.ops import stage4
    from jtokkit_tpu.utils.corpus import generate

    print("building engine...", flush=True)
    eng = _device_engine(encoding)
    print("engine ready; generating corpus...", flush=True)
    docs = generate(mb, seed=0, flavor=flavor)
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    plan = eng.preload_corpus(docs)
    print("preloaded; warming...", flush=True)
    total = eng.count_tokens_corpus(docs, plan=plan)  # warm + cache
    print(f"{nbytes/1e6:.2f} MB {flavor}, {len(plan)} chunks, "
          f"{total} tokens", flush=True)

    t = wall(lambda: eng.count_tokens_corpus(None, plan=plan), 4)
    print(f"steady count: {t*1e3:.1f} ms = {nbytes/t/1e6:.1f} MB/s", flush=True)

    # aggregate per-stage costs over ALL ok chunks (chunk routing from the
    # warmed plan cache — identical dispatch to the steady-state pass)
    oks = [
        (entry, c) for entry, c in zip(plan, plan.chunk_cache)
        if c["kind"] == "ok"
    ]
    print(f"ok chunks: {len(oks)}; kinds: "
          f"{[c['kind'] for c in plan.chunk_cache]}", flush=True)

    def all_stage_a():
        metas = []
        for (buf, de, parts, _a, buf_dev, de_dev), c in oks:
            _t, meta = eng._stage_a(c["variant"], c["divs"])(buf_dev, de_dev)
            metas.append(meta)
        # forcing the (small) metas waits for every chunk's stage-A program
        return np.stack([np.asarray(m) for m in metas])

    t_a = wall(all_stage_a)
    print(f"stage A all chunks: {t_a*1e3:.1f} ms "
          f"({nbytes/t_a/1e6:.1f} MB/s equiv)", flush=True)

    # per-bucket merge cost, summed over chunks
    bucket_t = {}
    for (buf, de, parts, _a, buf_dev, de_dev), c in oks:
        tab, _m = eng._stage_a(c["variant"], c["divs"])(buf_dev, de_dev)
        for (b, lanes, cap, cnt) in c["caps"]:
            key = (lanes, cap)

            def run(t=tab, b=b, lanes=lanes, cap=cap, cnt=cnt,
                    buf_dev=buf_dev):
                cols, outs = eng._merge_bucket_fn(lanes, cap)(
                    buf_dev, t.starts, t.lens, t.miss_sorted,
                    t.group_start[b], jnp.int32(cnt),
                    eng._byte_to_id, eng._byte_pair_seed,
                    eng._pair_rows_cat, eng.packed.table_mask,
                )
                # cols is small; fetching it waits for the merge program
                return np.asarray(cols)

            dt = wall(run, 3)
            ent = bucket_t.setdefault(key, [0.0, 0, 0])
            ent[0] += dt
            ent[1] += cnt
            ent[2] += 1
    tot_merge = sum(v[0] for v in bucket_t.values())
    for (lanes, cap), (dt, cnt, nch) in sorted(bucket_t.items()):
        print(f"  merge lanes={lanes:4d} cap={cap:6d}: {dt*1e3:7.2f} ms "
              f"({cnt} pieces over {nch} chunks)", flush=True)
    print(f"merges total: {tot_merge*1e3:.1f} ms", flush=True)
    print(f"residual (count - A - merges): "
          f"{(t - t_a - tot_merge)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
