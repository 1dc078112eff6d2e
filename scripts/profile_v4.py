"""Per-phase timing of the v4 pipeline on the real chip (np.asarray-forced)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, n=5):
    np.asarray(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from jtokkit_tpu.engine.device import DeviceEngine, _DIVS_PRIMARY
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks
    from jtokkit_tpu.utils.corpus import generate
    from jtokkit_tpu.ops import stage4, classify

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)

    docs = generate(8, seed=0, flavor="english")
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    plan = eng.preload_corpus(docs)
    print(f"{nbytes/1e6:.2f} MB, {len(plan)} chunks", flush=True)

    # end-to-end
    t = wall(lambda: eng.count_tokens_corpus(docs, plan=plan), 3)
    print(f"count_tokens_corpus: {t*1e3:.1f} ms = {nbytes/t/1e6:.1f} MB/s", flush=True)

    buf, doc_ends, parts, ascii_only, buf_dev, de_dev = plan[0]
    N = len(buf)
    fn = eng._stage_a("ascii", _DIVS_PRIMARY)

    # stage A per chunk: scalar-reduced to avoid output transfer
    @jax.jit
    def sa_scalar(b, de):
        t_, meta = stage4.stage_a_v4(
            b, de, eng._class_table, eng.pattern,
            eng._word_rows0, eng._word_rows1, eng.packed.word_mask,
            variant="ascii", piece_div=4, miss_div=8,
        )
        return (t_.starts.sum() + t_.lens.sum() + t_.hit.sum()
                + t_.miss_sorted.sum() + t_.doc_of.sum() + meta.sum())

    t = wall(lambda: sa_scalar(buf_dev, de_dev))
    print(f"stage A (1 MB chunk): {t*1e3:.2f} ms", flush=True)

    # sub-phases
    idx = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def ph_classify(b, de):
        D = de.shape[0]
        used = de[D - 1]
        sep_pos = jnp.where(de[: D - 1] < used, de[: D - 1], N)
        is_sep = jnp.zeros((N,), jnp.bool_).at[sep_pos].set(True, mode="drop")
        valid = (idx < used) & ~is_sep
        info = stage4.classify_ascii(b, valid)
        return info["cls"].sum()

    t = wall(lambda: ph_classify(buf_dev, de_dev))
    print(f"  classify_ascii: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def ph_bound(b, de):
        D = de.shape[0]
        used = de[D - 1]
        sep_pos = jnp.where(de[: D - 1] < used, de[: D - 1], N)
        is_sep = jnp.zeros((N,), jnp.bool_).at[sep_pos].set(True, mode="drop")
        valid = (idx < used) & ~is_sep
        info = stage4.classify_ascii(b, valid)
        mask, dep, did = stage4.piece_starts_v4(info, "cl100k", is_sep)
        return mask.sum() + dep.sum() + did.sum()

    t = wall(lambda: ph_bound(buf_dev, de_dev))
    print(f"  + piece_starts_v4: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def ph_nonzero(b, de):
        D = de.shape[0]
        used = de[D - 1]
        sep_pos = jnp.where(de[: D - 1] < used, de[: D - 1], N)
        is_sep = jnp.zeros((N,), jnp.bool_).at[sep_pos].set(True, mode="drop")
        valid = (idx < used) & ~is_sep
        info = stage4.classify_ascii(b, valid)
        mask, dep, did = stage4.piece_starts_v4(info, "cl100k", is_sep)
        starts = jnp.nonzero(mask, size=N // 4, fill_value=N)[0]
        return starts.sum()

    t = wall(lambda: ph_nonzero(buf_dev, de_dev))
    print(f"  + nonzero: {t*1e3:.2f} ms", flush=True)

    # merges for chunk0
    table, meta = fn(buf_dev, de_dev)
    meta_np = np.asarray(meta)
    print(f"meta {meta_np}", flush=True)
    for b_i, lanes in enumerate(stage4.BUCKET_WIDTHS):
        cnt = int(meta_np[2 + b_i])
        if cnt == 0:
            continue
        cap = eng._bucket_cap(N, lanes, cnt)
        mfn = eng._merge_bucket_fn(lanes, cap)

        def run():
            cols, ids, active = mfn(
                buf_dev, table.starts, table.lens, table.miss_sorted,
                table.group_start[b_i], jnp.int32(cnt),
                eng._byte_to_id, eng._byte_pair_id, eng._pair_rows0,
                eng._pair_rows1, eng.packed.table_mask,
            )
            return ids.sum() + active.sum()

        t = wall(run)
        print(f"  merge lanes={lanes} cnt={cnt} cap={cap}: {t*1e3:.2f} ms", flush=True)

    # stage C
    def run_c():
        counts = eng._counts_init(table.hit, table.n_pieces)
        offsets, n_tokens = eng._make_offsets(counts, table.n_pieces)
        dc = eng._doc_counts(counts, table.doc_of, table.n_pieces, len(doc_ends))
        return n_tokens + dc.sum()

    t = wall(run_c)
    print(f"  stage C (counts/offsets/doc): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
