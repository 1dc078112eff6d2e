"""Cumulative-prefix timing of stage_a_v4 sub-stages on the real chip.

Each checkpoint jits the function up to that point and reduces every live
array to one scalar (forcing materialization without a big D2H), so the
delta between consecutive checkpoints is that sub-stage's device cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    # through the axon tunnel block_until_ready does not reliably wait;
    # force completion by fetching the scalar result (constant ~fetch
    # latency cancels in the checkpoint deltas)
    np.asarray(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main(mb=8.0, flavor="english"):
    from jtokkit_tpu.engine.device import DeviceEngine, _DIVS_PRIMARY, \
        _DIVS_PRIMARY_UNICODE
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.ops import classify as classify_ops, pallas_scan, stage4
    from jtokkit_tpu.utils.corpus import generate
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name),
                       d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)
    docs = generate(mb, seed=0, flavor=flavor)
    plan = eng.preload_corpus(docs)
    buf, doc_ends, parts, ascii_only, buf_dev, de_dev = plan[0]
    N = len(buf)
    variant = "ascii" if ascii_only else "unicode"
    piece_div, miss_div = (_DIVS_PRIMARY if ascii_only
                           else _DIVS_PRIMARY_UNICODE)
    print(f"{flavor}: chunk N={N} variant={variant}", flush=True)
    P = N // piece_div
    M = N // miss_div
    ct = eng._class_table
    word_rows_cat = eng._word_rows_cat
    word_mask = eng.packed.word_mask
    pattern = eng.pattern

    def prefix(stop):
        # NOTE: this body intentionally mirrors stage4.stage_a_v4 (the
        # classify/boundaries/positions/fields/wordprobe/misspos/argsort
        # sections of jtokkit_tpu/ops/stage4.py:452-571) so each checkpoint
        # can cut the program at a sub-stage; keep the two in sync when
        # stage_a_v4 changes.
        def fn(buf, doc_ends):
            D = doc_ends.shape[0]
            idx = jnp.arange(N, dtype=jnp.int32)
            used = doc_ends[D - 1]
            sep_pos = jnp.where(doc_ends[: D - 1] < used,
                                doc_ends[: D - 1], N)
            is_sep = jnp.zeros((N,), jnp.bool_).at[sep_pos].set(
                True, mode="drop")
            valid = (idx < used) & ~is_sep
            if variant == "ascii":
                info = stage4.classify_ascii(buf, valid)
            else:
                info = classify_ops.classify_bytes(buf, ct, valid)
            if stop == "classify":
                return info["cls"].sum()
            mask, doc_end_pos = stage4.piece_starts_v4(
                info, pattern, ascii_chars=(variant == "ascii"))
            if stop == "boundaries":
                return mask.sum() + doc_end_pos.sum()
            n_pieces = mask.sum().astype(jnp.int32)
            b32 = buf.astype(jnp.uint32)
            ext = jnp.concatenate([b32, jnp.zeros((7,), jnp.uint32)])
            w0_b = (ext[:N] | (ext[1:N+1] << 8) | (ext[2:N+2] << 16)
                    | (ext[3:N+3] << 24)).astype(jnp.int32)
            w1_b = (ext[4:N+4] | (ext[5:N+5] << 8) | (ext[6:N+6] << 16)
                    | (ext[7:N+7] << 24)).astype(jnp.int32)
            fields = jnp.stack([w0_b, w1_b, doc_end_pos], axis=1)
            starts, frow = stage4.masked_rows(mask, fields, P, N)
            if stop == "positions":
                return starts.sum() + n_pieces
            p_iota = jnp.arange(P, dtype=jnp.int32)
            piece_valid = p_iota < jnp.minimum(n_pieces, P)
            pw0_raw, pw1_raw, dend = frow[:, 0], frow[:, 1], frow[:, 2]
            next_start = jnp.concatenate(
                [starts[1:], jnp.full((1,), N, jnp.int32)])
            ends = jnp.minimum(next_start, dend)
            lens = jnp.where(piece_valid, ends - starts, 0).astype(jnp.int32)
            if stop == "fields":
                return lens.sum() + pw0_raw.sum() + pw1_raw.sum()
            l0 = (jnp.clip(lens, 0, 4) * 8).astype(jnp.uint32)
            l1 = (jnp.clip(lens - 4, 0, 4) * 8).astype(jnp.uint32)
            full = jnp.uint32(0xFFFFFFFF)
            m0 = jnp.where(l0 >= 32, full, (jnp.uint32(1) << l0) - 1)
            m1 = jnp.where(l1 >= 32, full, (jnp.uint32(1) << l1) - 1)
            pw0 = (pw0_raw.astype(jnp.uint32) & m0).astype(jnp.int32)
            pw1 = (pw1_raw.astype(jnp.uint32) & m1).astype(jnp.int32)
            short = piece_valid & (lens >= 1) & (lens <= 8)
            hv = pw1.astype(jnp.uint32) ^ (
                lens.astype(jnp.uint32) * jnp.uint32(stage4._LEN_MIX))
            s1 = stage4._mix(pw0, hv, stage4._H1, word_mask)
            s2 = stage4._mix(pw0, hv, stage4._H2, word_mask) + (word_mask + 1)
            s = jnp.stack([s1, s2])
            r = jnp.take(word_rows_cat, s, axis=0, mode="clip")
            ok = ((r[..., 0] == pw0[None]) & (r[..., 1] == pw1[None])
                  & (r[..., 2] >> 20 == lens[None]) & (r[..., 2] >= 0))
            hit = jnp.where(ok[0], r[0, :, 2] & 0xFFFFF, -1)
            hit = jnp.where((hit < 0) & ok[1], r[1, :, 2] & 0xFFFFF, hit)
            hit = jnp.where(short, hit, -1)
            if stop == "wordprobe":
                return hit.sum()
            miss = piece_valid & (hit < 0)
            n_miss = miss.sum().astype(jnp.int32)
            miss_idx = stage4.masked_positions(miss, M, P - 1)
            if stop == "misspos":
                return miss_idx.sum() + n_miss
            m_valid = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(n_miss, M)
            m_len = jnp.where(m_valid, lens[miss_idx], 0)
            bucket_of = jnp.zeros_like(m_len)
            for w in stage4.BUCKET_WIDTHS[:-1]:
                bucket_of = bucket_of + (m_len > w).astype(jnp.int32)
            bucket_of = jnp.where(m_valid, bucket_of,
                                  len(stage4.BUCKET_WIDTHS))
            order = jnp.argsort(bucket_of, stable=True).astype(jnp.int32)
            miss_sorted = miss_idx[order]
            bucket_counts = jnp.bincount(
                jnp.minimum(bucket_of, len(stage4.BUCKET_WIDTHS)),
                length=len(stage4.BUCKET_WIDTHS) + 1,
            ).astype(jnp.int32)[: len(stage4.BUCKET_WIDTHS)]
            return miss_sorted.sum() + bucket_counts.sum()
        return jax.jit(fn)

    prev = 0.0
    for stop in ("classify", "boundaries", "positions", "fields",
                 "wordprobe", "misspos", "argsort"):
        f = prefix(stop)
        t = timeit(lambda: f(buf_dev, de_dev))
        print(f"{stop:12s}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:7.2f} ms)",
              flush=True)
        prev = t

    # isolated primitives
    mask_dev = jax.block_until_ready(jax.jit(
        lambda b: (b % 5 == 0))(buf_dev))
    f_mp = jax.jit(lambda m: stage4.masked_positions(m, P, N).sum())
    t = timeit(lambda: f_mp(mask_dev))
    print(f"masked_positions alone (P={P}): {t*1e3:.2f} ms", flush=True)

    f_sort = jax.jit(lambda m: jnp.sort(
        jnp.where(m.reshape(-1, 128),
                  jnp.arange(N, dtype=jnp.int32).reshape(-1, 128),
                  jnp.int32(N)), axis=1).sum())
    t = timeit(lambda: f_sort(mask_dev))
    print(f"row sort [N/128,128] alone: {t*1e3:.2f} ms", flush=True)

    f_scan = jax.jit(lambda x: pallas_scan.scan_leaves(
        [x.astype(jnp.int32)], ["max"])[0].sum())
    t = timeit(lambda: f_scan(buf_dev))
    print(f"pallas scan 1 leaf over N: {t*1e3:.2f} ms", flush=True)

    mi = jax.block_until_ready(jax.jit(
        lambda b: b[:M].astype(jnp.int32))(buf_dev))
    f_as = jax.jit(lambda x: jnp.argsort(x, stable=True).sum())
    t = timeit(lambda: f_as(mi))
    print(f"argsort M={M}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    flavor = sys.argv[2] if len(sys.argv) > 2 else "english"
    main(mb, flavor)
