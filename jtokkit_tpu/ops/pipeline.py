"""Staged device encode pipeline (v3).

The monolithic one-jit design had three structural costs: giant programs
compile for tens of minutes through the remote-compile tunnel, empty merge
buckets still pay full-capacity gathers and loop rounds, and capacities sized
for worst cases waste an order of magnitude of work on natural text (96%+ of
English pieces resolve in the word-table direct hit; misses concentrate in
the 8/32-lane buckets).

v3 splits the chunk into SMALL jits chained through device-resident arrays —
host syncs stay per *batch*, not per stage:

  stage A (one jit):   classify → boundaries → piece table → word-table
                       direct hits → miss compaction, bucket-grouped
  host:                reads only (n_pieces, miss bucket counts, overflow)
                       for every dispatched chunk at once
  stage B (per nonempty bucket, jit keyed on (lanes, cap)): slice the
                       bucket's piece columns, gather bytes, exact merge —
                       cap is the smallest power of two covering the ACTUAL
                       count, so work tracks content, not worst cases
  stage C (small jits): counts → offsets → hit scatter → bucket scatters →
                       per-doc counts

Every stage compiles in seconds and is reused across chunk shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import boundaries, classify, merge

PIECE_DIV = 2   # piece-table capacity N // PIECE_DIV
MISS_DIV = 8    # miss-table capacity N // MISS_DIV
BUCKET_WIDTHS = (8, 32, 128, 512, 4096)
# guaranteed per-bucket maxima (pieces of len > prev width fit at most
# N/(prev+1) times in N bytes; the 8-wide bucket is bounded by the miss table)
BUCKET_MAX_DIV = {8: MISS_DIV, 32: 9, 128: 33, 512: 129, 4096: 513}
MAX_PIECE_LEN = BUCKET_WIDTHS[-1]

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


class PieceTable(NamedTuple):
    """Stage-A output; all device-resident."""

    starts: jnp.ndarray        # int32[P]
    lens: jnp.ndarray          # int32[P]
    hit: jnp.ndarray           # int32[P] direct-hit token id or -1
    doc_of: jnp.ndarray        # int32[P]
    miss_sorted: jnp.ndarray   # int32[M] piece indices, grouped by bucket
    group_start: jnp.ndarray   # int32[len(BUCKET_WIDTHS)+1]
    n_pieces: jnp.ndarray      # int32 scalar
    bucket_counts: jnp.ndarray  # int32[len(BUCKET_WIDTHS)]
    overflow: jnp.ndarray      # int32 scalar


def stage_a(
    buf, valid, doc_ends, class_table, pattern,
    word_w0, word_w1, word_lenid, word_mask,
) -> PieceTable:
    N = buf.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    P = N // PIECE_DIV
    M = N // MISS_DIV

    info = classify.classify_bytes(buf, class_table, valid)
    mask = boundaries.piece_starts(info, pattern)

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
    overflow = overflow + (
        jnp.where(piece_valid, lens, 0).max(initial=0) > MAX_PIECE_LEN
    ).astype(jnp.int32)

    doc_of = jnp.searchsorted(doc_ends, starts, side="right").astype(jnp.int32)
    doc_of = jnp.minimum(doc_of, doc_ends.shape[0] - 1)

    # word-table direct hit (pieces of 1..8 bytes)
    b32 = buf.astype(jnp.uint32)
    ext = jnp.concatenate([b32, jnp.zeros((7,), jnp.uint32)])
    w0_b = (
        ext[:N] | (ext[1 : N + 1] << 8) | (ext[2 : N + 2] << 16)
        | (ext[3 : N + 3] << 24)
    )
    w1_b = (
        ext[4 : N + 4] | (ext[5 : N + 5] << 8) | (ext[6 : N + 6] << 16)
        | (ext[7 : N + 7] << 24)
    )
    pw0 = w0_b[start_clip]
    pw1 = w1_b[start_clip]
    l0 = (jnp.clip(lens, 0, 4) * 8).astype(jnp.uint32)
    l1 = (jnp.clip(lens - 4, 0, 4) * 8).astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    m0 = jnp.where(l0 >= 32, full, (jnp.uint32(1) << l0) - 1)
    m1 = jnp.where(l1 >= 32, full, (jnp.uint32(1) << l1) - 1)
    pw0 = (pw0 & m0).astype(jnp.int32)
    pw1 = (pw1 & m1).astype(jnp.int32)

    short = piece_valid & (lens >= 1) & (lens <= 8)
    hv = pw1.astype(jnp.uint32) ^ (
        lens.astype(jnp.uint32) * jnp.uint32(_LEN_MIX)
    )
    s1 = _mix(pw0, hv, _H1, word_mask)
    s2 = _mix(pw0, hv, _H2, word_mask)

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

    # compact misses, grouped by length bucket (stable: stream order kept)
    miss = piece_valid & (hit < 0)
    n_miss = miss.sum().astype(jnp.int32)
    overflow = overflow + (n_miss > M).astype(jnp.int32)
    miss_idx = jnp.nonzero(miss, size=M, fill_value=P - 1)[0].astype(jnp.int32)
    m_valid = jnp.arange(M, dtype=jnp.int32) < n_miss
    m_len = jnp.where(m_valid, lens[miss_idx], 0)
    widths = jnp.asarray(BUCKET_WIDTHS, jnp.int32)
    bucket_of = jnp.searchsorted(widths, m_len, side="left").astype(jnp.int32)
    bucket_of = jnp.where(m_valid, bucket_of, len(BUCKET_WIDTHS))
    order = jnp.argsort(bucket_of, stable=True).astype(jnp.int32)
    miss_sorted = miss_idx[order]
    bucket_counts = jnp.bincount(
        jnp.minimum(bucket_of, len(BUCKET_WIDTHS)),
        length=len(BUCKET_WIDTHS) + 1,
    ).astype(jnp.int32)[: len(BUCKET_WIDTHS)]
    group_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bucket_counts).astype(jnp.int32)]
    )

    # meta packs everything the host needs to read into ONE small fetch:
    # [overflow, n_pieces, bucket_count_0..4]
    meta = jnp.concatenate(
        [overflow[None], n_pieces[None], bucket_counts]
    ).astype(jnp.int32)
    return PieceTable(
        starts, lens, hit, doc_of, miss_sorted, group_start,
        n_pieces, bucket_counts, overflow,
    ), meta


def merge_bucket(
    buf, starts, lens, miss_sorted, group_start_b, count_b,
    byte_to_id, byte_pair_id, cuckoo_u, cuckoo_v, cuckoo_id, table_mask,
    *, lanes: int, cap: int,
):
    """Exact merge of one bucket's pieces. ``cap`` is static (the host picks
    the smallest power of two ≥ the actual count).

    Returns (cols int32[cap] piece indices, ids int32[lanes, cap],
    active bool[lanes, cap]).
    """
    N = buf.shape[0]
    M = miss_sorted.shape[0]
    r = jnp.arange(cap, dtype=jnp.int32)
    take = jnp.minimum(group_start_b + r, M - 1)
    cols = miss_sorted[take]
    live = r < count_b
    c_start = jnp.where(live, starts[cols], 0)
    c_len = jnp.where(live, lens[cols], 0)

    grows = jnp.arange(lanes, dtype=jnp.int32)[:, None]
    gidx = jnp.minimum(c_start[None, :] + grows, N - 1)
    mat_t = jnp.where(grows < c_len[None, :], buf[gidx], 0)

    ids, active = merge.merge_rows_t(
        mat_t, c_len, byte_to_id, byte_pair_id,
        cuckoo_u, cuckoo_v, cuckoo_id, table_mask,
    )
    return cols, ids, active & live[None, :]


def merge_bucket_v2(
    buf, starts, lens, miss_sorted, group_start_b, count_b,
    byte_to_id, byte_pair_id, pair_rows0, pair_rows1, table_mask,
    *, lanes: int, cap: int,
):
    """merge_bucket with packed cuckoo rows (2 row gathers per probe site;
    see :func:`jtokkit_tpu.ops.merge.pair_lookup_rows`)."""
    N = buf.shape[0]
    M = miss_sorted.shape[0]
    r = jnp.arange(cap, dtype=jnp.int32)
    take = jnp.minimum(group_start_b + r, M - 1)
    cols = miss_sorted[take]
    live = r < count_b
    c_start = jnp.where(live, starts[cols], 0)
    c_len = jnp.where(live, lens[cols], 0)

    grows = jnp.arange(lanes, dtype=jnp.int32)[:, None]
    gidx = jnp.minimum(c_start[None, :] + grows, N - 1)
    mat_t = jnp.where(grows < c_len[None, :], buf[gidx], 0)

    ids, active = merge.merge_rows_t2(
        mat_t, c_len, byte_to_id, byte_pair_id,
        pair_rows0, pair_rows1, table_mask,
    )
    return cols, ids, active & live[None, :]


def merge_bucket_v3(
    buf, starts, lens, miss_sorted, group_start_b, count_b,
    byte_to_id, byte_pair_id, pair_rows_cat, table_mask,
    *, lanes: int, cap: int,
):
    """merge_bucket with the stacked cuckoo table (ONE row gather per round
    covering both lookup sites and both probes; see
    :func:`jtokkit_tpu.ops.merge.pair_lookup_cat`)."""
    N = buf.shape[0]
    M = miss_sorted.shape[0]
    r = jnp.arange(cap, dtype=jnp.int32)
    take = jnp.minimum(group_start_b + r, M - 1)
    cols = miss_sorted[take]
    live = r < count_b
    c_start = jnp.where(live, starts[cols], 0)
    c_len = jnp.where(live, lens[cols], 0)

    grows = jnp.arange(lanes, dtype=jnp.int32)[:, None]
    gidx = jnp.minimum(c_start[None, :] + grows, N - 1)
    mat_t = jnp.where(grows < c_len[None, :], buf[gidx], 0)

    ids, active = merge.merge_rows_t3(
        mat_t, c_len, byte_to_id, byte_pair_id, pair_rows_cat, table_mask,
    )
    return cols, ids, active & live[None, :]


# ---------------------------------------------------------------------------
# stage C pieces (each is a small jit in the engine)
# ---------------------------------------------------------------------------

def counts_init(hit, n_pieces):
    P = hit.shape[0]
    piece_valid = jnp.arange(P, dtype=jnp.int32) < n_pieces
    return jnp.where(piece_valid & (hit >= 0), 1, 0).astype(jnp.int32)


def counts_add_bucket(counts, cols, active):
    return counts.at[cols].add(active.sum(axis=0).astype(jnp.int32), mode="drop")


def make_offsets(counts, n_pieces):
    P = counts.shape[0]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    n_tokens = offsets[jnp.minimum(n_pieces, P)]
    return offsets, n_tokens


def scatter_hits(n_out, hit, offsets, n_pieces):
    P = hit.shape[0]
    piece_valid = jnp.arange(P, dtype=jnp.int32) < n_pieces
    tgt = jnp.where(piece_valid & (hit >= 0), offsets[:P], n_out)
    return jnp.zeros((n_out,), jnp.int32).at[tgt].set(
        jnp.maximum(hit, 0), mode="drop"
    )


def scatter_bucket(tokens, ids, active, cols, offsets):
    n_out = tokens.shape[0]
    pos = jnp.cumsum(active, axis=0).astype(jnp.int32) - 1
    tgt = jnp.where(active, offsets[cols][None, :] + pos, n_out)
    return tokens.at[tgt.reshape(-1)].set(ids.reshape(-1), mode="drop")


def doc_token_counts(counts, doc_of, n_pieces, n_docs: int):
    P = counts.shape[0]
    piece_valid = jnp.arange(P, dtype=jnp.int32) < n_pieces
    return jnp.zeros((n_docs,), jnp.int32).at[doc_of].add(
        jnp.where(piece_valid, counts, 0), mode="drop"
    )
