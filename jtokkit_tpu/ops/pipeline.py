"""Single-jit full-device encode pipeline (v2: direct-hit fast path).

Everything between raw bytes and token ids runs inside ONE compiled XLA
program per chunk shape — no host round-trips mid-pipeline:

    bytes[N], valid[N]
      → classify + piece boundaries          (ops/classify, ops/boundaries)
      → piece table (starts / lens / doc)
      → WORD-TABLE DIRECT HIT: pieces of ≤8 bytes pack into two int32 words
        (pure elementwise shifts; only 2 gathers per piece) and probe a
        cuckoo word table with exact (w0, w1, len) compare. This resolves
        the overwhelming majority of natural-language pieces in O(1) —
        the device analog of the reference's whole-piece fast path
        (``M/GptBytePairEncoding.java:81-83``), made exact without byte-
        string hashing.
      → misses compact (nonzero) into small length-bucketed matrices and run
        the exact merge                       (ops/merge.merge_rows_t)
      → token scatter back to stream order → tokens[N], counts

Static capacities are sized for natural text and *checked*: the program
returns an ``overflow`` flag (piece table, miss table, or a bucket over
capacity — only adversarial inputs like alternating 1-byte pieces trigger
it) and the caller reruns that chunk on the host engine. Exactness is never
at risk: overflow is detected, not silently truncated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import boundaries, classify, merge

# miss-merge buckets: (lane width, capacity divisor relative to N).
# len>8 buckets use the guaranteed bound (#pieces of len>L/4 <= N/(L/4+1));
# the 8-wide bucket holds all short misses and is bounded by MISS_DIV.
PIECE_DIV = 2   # piece-table capacity N//PIECE_DIV
MISS_DIV = 8    # miss-table capacity N//MISS_DIV
BUCKETS = (
    (8, MISS_DIV),
    (32, 9),
    (128, 33),
    (512, 129),
    (4096, 513),
)
MAX_PIECE_LEN = BUCKETS[-1][0]

_H1 = (0x9E3779B1, 0x85EBCA77, 0x2C1B3C6D)
_H2 = (0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)
_LEN_MIX = 0x01000193


def _mix(u, v, consts, mask):
    a, b, c = (jnp.uint32(x) for x in consts)
    h = (u.astype(jnp.uint32) * a) ^ (v.astype(jnp.uint32) * b)
    h = h ^ (h >> 15)
    h = h * c
    h = h ^ (h >> 13)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


class ChunkResult(NamedTuple):
    tokens: jnp.ndarray        # int32[N] token ids, stream order, padded
    n_tokens: jnp.ndarray      # int32 scalar
    piece_count: jnp.ndarray   # int32 scalar
    overflow: jnp.ndarray      # int32 scalar: 0 = ok, else host fallback
    doc_counts: jnp.ndarray    # int32[D] tokens per document


def encode_chunk(
    buf: jnp.ndarray,          # uint8[N]
    valid: jnp.ndarray,        # bool[N]
    doc_ends: jnp.ndarray,     # int32[D]
    class_table: jnp.ndarray,
    pattern: str,
    byte_to_id: jnp.ndarray,
    byte_pair_id: jnp.ndarray,
    cuckoo_u: jnp.ndarray,
    cuckoo_v: jnp.ndarray,
    cuckoo_id: jnp.ndarray,
    table_mask: int,
    word_w0: jnp.ndarray,
    word_w1: jnp.ndarray,
    word_lenid: jnp.ndarray,   # int32[2, S]: (len << 20) | id, -1 empty
    word_mask: int,
) -> ChunkResult:
    N = buf.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    P = N // PIECE_DIV
    M = N // MISS_DIV

    # ---- 1. boundaries ------------------------------------------------
    info = classify.classify_bytes(buf, class_table, valid)
    mask = boundaries.piece_starts(info, pattern)

    # ---- 2. piece table ----------------------------------------------
    n_pieces = mask.sum().astype(jnp.int32)
    starts = jnp.nonzero(mask, size=P, fill_value=N)[0].astype(jnp.int32)
    p_iota = jnp.arange(P, dtype=jnp.int32)
    piece_valid = p_iota < n_pieces

    next_invalid = jax.lax.associative_scan(
        jnp.minimum, jnp.where(valid, N, idx), reverse=True
    )
    next_start = jnp.concatenate([starts[1:], jnp.full((1,), N, jnp.int32)])
    start_clip = jnp.minimum(starts, N - 1)
    ends = jnp.minimum(next_start, next_invalid[start_clip])
    lens = jnp.where(piece_valid, ends - starts, 0).astype(jnp.int32)

    overflow = (n_pieces > P).astype(jnp.int32)
    overflow += (jnp.where(piece_valid, lens, 0).max(initial=0) > MAX_PIECE_LEN)

    doc_of_piece = jnp.searchsorted(doc_ends, starts, side="right").astype(jnp.int32)
    doc_of_piece = jnp.minimum(doc_of_piece, doc_ends.shape[0] - 1)

    # ---- 3. word-table direct hit ------------------------------------
    # per-byte packed words (elementwise; no gather)
    b32 = buf.astype(jnp.uint32)
    z = jnp.zeros((7,), jnp.uint32)
    ext = jnp.concatenate([b32, z])
    w0_b = (
        ext[:N]
        | (ext[1 : N + 1] << 8)
        | (ext[2 : N + 2] << 16)
        | (ext[3 : N + 3] << 24)
    )
    w1_b = (
        ext[4 : N + 4]
        | (ext[5 : N + 5] << 8)
        | (ext[6 : N + 6] << 16)
        | (ext[7 : N + 7] << 24)
    )
    pw0 = w0_b[start_clip]
    pw1 = w1_b[start_clip]
    # zero bytes past the piece length
    l0 = jnp.clip(lens, 0, 4) * 8
    l1 = jnp.clip(lens - 4, 0, 4) * 8
    full = jnp.uint32(0xFFFFFFFF)
    m0 = jnp.where(l0 >= 32, full, (jnp.uint32(1) << l0.astype(jnp.uint32)) - 1)
    m1 = jnp.where(l1 >= 32, full, (jnp.uint32(1) << l1.astype(jnp.uint32)) - 1)
    pw0 = (pw0 & m0).astype(jnp.int32)
    pw1 = (pw1 & m1).astype(jnp.int32)

    short = piece_valid & (lens >= 1) & (lens <= 8)
    hv = pw1.astype(jnp.uint32) ^ (lens.astype(jnp.uint32) * jnp.uint32(_LEN_MIX))
    s1 = _mix(pw0, hv, _H1, word_mask)
    s2 = _mix(pw0, hv, _H2, word_mask)
    li = lens << 20

    def probe(t, s):
        ok = (
            (word_w0[t][s] == pw0)
            & (word_w1[t][s] == pw1)
            & (word_lenid[t][s] >> 20 == lens)
            & (word_lenid[t][s] >= 0)
        )
        return jnp.where(ok, word_lenid[t][s] & 0xFFFFF, -1)

    hit = probe(0, s1)
    hit = jnp.where(hit < 0, probe(1, s2), hit)
    hit = jnp.where(short, hit, -1)

    # ---- 4. compact misses -------------------------------------------
    miss = piece_valid & (hit < 0)
    n_miss = miss.sum().astype(jnp.int32)
    overflow += (n_miss > M).astype(jnp.int32)
    miss_idx = jnp.nonzero(miss, size=M, fill_value=P - 1)[0].astype(jnp.int32)
    m_iota = jnp.arange(M, dtype=jnp.int32)
    m_valid = m_iota < n_miss
    m_start = jnp.where(m_valid, starts[miss_idx], 0)
    m_len = jnp.where(m_valid, lens[miss_idx], 0)

    counts = jnp.where(piece_valid & (hit >= 0), 1, 0).astype(jnp.int32)

    widths = jnp.asarray([w for w, _ in BUCKETS], jnp.int32)
    bucket_of = jnp.searchsorted(widths, m_len, side="left").astype(jnp.int32)
    bucket_of = jnp.where(m_valid, bucket_of, len(BUCKETS))
    order = jnp.argsort(bucket_of, stable=True).astype(jnp.int32)
    bucket_sizes = jnp.bincount(
        jnp.minimum(bucket_of, len(BUCKETS)), length=len(BUCKETS) + 1
    ).astype(jnp.int32)
    group_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bucket_sizes)[:-1].astype(jnp.int32)]
    )

    out_per_bucket = []
    for b, (lanes, div) in enumerate(BUCKETS):
        cap = max(N // div, 8)
        overflow += (bucket_sizes[b] > cap).astype(jnp.int32)
        r = jnp.arange(cap, dtype=jnp.int32)
        mrow = order[jnp.minimum(group_start[b] + r, M - 1)]
        col_live = r < jnp.minimum(bucket_sizes[b], cap)
        c_start = jnp.where(col_live, m_start[mrow], 0)
        c_len = jnp.where(col_live, m_len[mrow], 0)
        p_global = miss_idx[mrow]  # piece index in piece table

        grows = jnp.arange(lanes, dtype=jnp.int32)[:, None]
        gidx = jnp.minimum(c_start[None, :] + grows, N - 1)
        mat_t = jnp.where(grows < c_len[None, :], buf[gidx], 0)

        ids, active = merge.merge_rows_t(
            mat_t, c_len, byte_to_id, byte_pair_id,
            cuckoo_u, cuckoo_v, cuckoo_id, table_mask,
        )
        col_counts = active.sum(axis=0).astype(jnp.int32)
        counts = counts.at[p_global].add(
            jnp.where(col_live, col_counts, 0), mode="drop"
        )
        out_per_bucket.append((p_global, col_live, ids, active))

    # ---- 5. token scatter to stream order -----------------------------
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    n_tokens = offsets[jnp.minimum(n_pieces, P)]
    tokens = jnp.zeros((N,), jnp.int32)
    # direct hits: one token per piece
    hit_tgt = jnp.where(piece_valid & (hit >= 0), offsets[:P], N)
    tokens = tokens.at[hit_tgt].set(jnp.maximum(hit, 0), mode="drop")
    # merged pieces
    for p_global, col_live, ids, active in out_per_bucket:
        pos_in_piece = jnp.cumsum(active, axis=0).astype(jnp.int32) - 1
        tgt = offsets[p_global][None, :] + pos_in_piece
        put = active & col_live[None, :]
        tgt = jnp.where(put, tgt, N)
        tokens = tokens.at[tgt.reshape(-1)].set(ids.reshape(-1), mode="drop")

    doc_counts = jnp.zeros((doc_ends.shape[0],), jnp.int32).at[
        doc_of_piece
    ].add(jnp.where(piece_valid, counts, 0), mode="drop")

    return ChunkResult(tokens, n_tokens, n_pieces, overflow, doc_counts)
