"""Device byte-pair merge: HOT LOOP 2 as a vectorized fixed-point iteration.

Replaces the reference's per-piece merge loop (reference
``M/GptBytePairEncoding.java:200-275``) with a formulation that is bit-exact
by construction: pieces are padded into a [rows, lanes] matrix and the
*sequential* min-rank merge runs one step per piece per iteration,
vectorized ACROSS pieces (rows). Each iteration per row:

  1. argmin of pair ranks (leftmost tie-break — same as the reference's
     strict ``<`` scan, ``:232-240``),
  2. merge that pair: left span takes the merged token id (the pair-table
     value; ranks and ids coincide in tiktoken vocabularies), right span
     deactivates (``parts.remove``, ``:259``),
  3. recompute the two affected neighbor ranks via cuckoo pair lookups
     (``:254-257``) — exactly two gathers each, no probe loops.

Rank lookups use the integer pair tables from
:mod:`jtokkit_tpu.vocab.tables`; the initial seeding (``:216-221``) is a
single gather into the direct 256×256 byte-pair table because all initial
spans are single-byte tokens.

The iteration count for a batch is max(merges per piece); rows that finish
early become no-ops. ``lax.while_loop`` exits when every row's min rank is
MAX (``:260-262``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_RANK = jnp.int32(0x7FFFFFFF)

_H1 = (0x9E3779B1, 0x85EBCA77, 0x2C1B3C6D)
_H2 = (0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _mix(u, v, consts, mask):
    a, b, c = (jnp.uint32(x) for x in consts)
    h = (u.astype(jnp.uint32) * a) ^ (v.astype(jnp.uint32) * b)
    h = h ^ (h >> 15)
    h = h * c
    h = h ^ (h >> 13)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def pair_lookup(u, v, cuckoo_u, cuckoo_v, cuckoo_id, table_mask):
    """(u, v) -> merged id, or -1. Exactly two gathers (cuckoo tables).

    Mirrors :meth:`jtokkit_tpu.vocab.tables.PackedVocabulary.lookup_pairs`.
    """
    s1 = _mix(u, v, _H1, table_mask)
    s2 = _mix(u, v, _H2, table_mask)
    hit1 = (cuckoo_u[0][s1] == u) & (cuckoo_v[0][s1] == v)
    hit2 = (cuckoo_u[1][s2] == u) & (cuckoo_v[1][s2] == v)
    out = jnp.where(hit1, cuckoo_id[0][s1], -1)
    return jnp.where(hit2, cuckoo_id[1][s2], out)


def pair_lookup_rows(u, v, pair_rows0, pair_rows1, table_mask):
    """(u, v) -> merged id, or -1 — TWO row gathers instead of six scalar
    gathers: the cuckoo tables are packed as int32[T, 4] rows (u, v, id, 0),
    so each probe fetches its full entry in one gather. Gather cost on TPU is
    per output element, so 2x4-wide rows beat 6 single-column gathers ~2x
    (measured in scripts/profile_slope.py)."""
    s1 = _mix(u, v, _H1, table_mask)
    s2 = _mix(u, v, _H2, table_mask)
    r1 = jnp.take(pair_rows0, s1, axis=0, mode="clip")
    r2 = jnp.take(pair_rows1, s2, axis=0, mode="clip")
    hit1 = (r1[..., 0] == u) & (r1[..., 1] == v)
    hit2 = (r2[..., 0] == u) & (r2[..., 1] == v)
    out = jnp.where(hit1, r1[..., 2], -1)
    return jnp.where(hit2, r2[..., 2], out)


def pair_lookup_cat(u, v, pair_rows_cat, table_mask):
    """(u, v) -> merged id, or -1 — one row gather per cuckoo HALF.

    ``pair_rows_cat`` is the two cuckoo tables stacked along rows
    ([2T, 4], table 1 offset by T = table_mask + 1), passed as a TRACED
    argument; the [:T]/[T:] halves are in-program slices. Measured on v5e
    (scripts/profile_gather_provenance.py): gathers from in-program slices
    of an argument run ~3.1 ns/row, closed-over constants ~6.5 ns/row,
    and whole 2^18-row operands ~11 ns/row (an XLA lowering bad zone —
    2^17 and 2^20 are both fast). Batched lookup SITES still share each
    gather via the leading index dim."""
    T = table_mask + 1
    s1 = _mix(u, v, _H1, table_mask)
    s2 = _mix(u, v, _H2, table_mask)
    r1 = jnp.take(pair_rows_cat[:T], s1, axis=0, mode="clip")
    r2 = jnp.take(pair_rows_cat[T:], s2, axis=0, mode="clip")
    hit1 = (r1[..., 0] == u) & (r1[..., 1] == v)
    hit2 = (r2[..., 0] == u) & (r2[..., 1] == v)
    out = jnp.where(hit1, r1[..., 2], -1)
    return jnp.where(hit2, r2[..., 2], out)


def merge_rows_t2(mat_t, lens, byte_to_id, byte_pair_id, pair_rows0,
                  pair_rows1, table_mask):
    """Transposed-layout merge with packed cuckoo rows (see merge_rows_t).

    Semantics identical to :func:`merge_rows_t` / the reference merge loop
    (``M/GptBytePairEncoding.java:200-275``); only the pair-table lookup
    mechanics differ (2 row gathers per probe site instead of 6 gathers).

    Returns (ids_t int32[W, R], active_t bool[W, R]).
    """
    W, R = mat_t.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    b = mat_t.astype(jnp.int32)

    active = subl < lens[None, :]
    ids = jnp.where(active, jnp.take(byte_to_id, b), -1)

    b_next = jnp.concatenate([b[1:, :], jnp.zeros((1, R), jnp.int32)], axis=0)
    is_pair = subl + 1 < lens[None, :]
    rank = jnp.where(is_pair, jnp.take(byte_pair_id, b * 256 + b_next), -1)
    rank = jnp.where(rank < 0, MAX_RANK, rank)

    def lookup(u, v):
        found = pair_lookup_rows(u, v, pair_rows0, pair_rows1, table_mask)
        return jnp.where(found < 0, MAX_RANK, found)

    BIG = jnp.int32(W + 1)

    def at_sublane(x, m, fill):
        return jnp.min(jnp.where(subl == m[None, :], x, fill), axis=0)

    def cond(state):
        return state[3]

    def body(state):
        ids, rank, active, _ = state
        m = jnp.argmin(rank, axis=0).astype(jnp.int32)
        minval = jnp.min(rank, axis=0)
        do = minval < MAX_RANK

        after_m = active & (subl > m[None, :])
        nxt = jnp.min(jnp.where(after_m, subl, BIG), axis=0)
        prv = jnp.max(jnp.where(active & (subl < m[None, :]), subl, -1), axis=0)
        nxt2 = jnp.min(jnp.where(active & (subl > nxt[None, :]), subl, BIG), axis=0)

        one_m = subl == m[None, :]
        one_n = subl == nxt[None, :]
        do_row = do[None, :]
        new_ids = jnp.where(one_m & do_row, minval[None, :], ids)
        new_active = active & ~(one_n & do_row)

        id_m = minval
        id_prv = at_sublane(ids, prv, MAX_RANK)
        id_nxt2 = at_sublane(ids, nxt2, MAX_RANK)
        rank_m = jnp.where(nxt2 <= W, lookup(id_m, id_nxt2), MAX_RANK)
        rank_prv = jnp.where(prv >= 0, lookup(id_prv, id_m), MAX_RANK)

        one_p = subl == prv[None, :]
        new_rank = jnp.where(one_m & do_row, rank_m[None, :], rank)
        new_rank = jnp.where(one_p & do_row, rank_prv[None, :], new_rank)
        new_rank = jnp.where(one_n & do_row, MAX_RANK, new_rank)

        any_left = jnp.any(jnp.min(new_rank) < MAX_RANK)
        return new_ids, new_rank, new_active, any_left

    init = (ids, rank, active, jnp.any(jnp.min(rank) < MAX_RANK))
    ids, rank, active, _ = jax.lax.while_loop(cond, body, init)
    return ids, active


import os as _os

# while_loop steps per iteration: unrolling amortizes the loop's fixed
# per-iteration overhead at the cost of longer compiles and (rounds mod K)
# wasted no-op steps at the tail. Exactness is unaffected — each unrolled
# step is the same sequential merge step.
_UNROLL = max(1, int(_os.environ.get("JTOKKIT_TPU_MERGE_UNROLL", "1")))


def t3_round(ids, rank, active, pair_rows_cat, table_mask):
    """ONE sequential merge step per column of a [W, R] state (the
    reference's single iteration, ``M/GptBytePairEncoding.java:223-263``):
    leftmost min-rank pair merges, the two affected neighbor ranks
    recompute via one batched cuckoo row gather. Shared by
    :func:`merge_rows_t3` (full byte-seeded merge) and the wide-bucket
    hybrid engine (:func:`jtokkit_tpu.ops.merge_exact.merge_bucket_exact`),
    which enters mid-merge with compacted state.

    Returns (ids, rank, active) after the step.
    """
    W, R = ids.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    BIG = jnp.int32(W + 1)

    def at_sublane(x, m, fill):
        return jnp.min(jnp.where(subl == m[None, :], x, fill), axis=0)

    m = jnp.argmin(rank, axis=0).astype(jnp.int32)
    minval = jnp.min(rank, axis=0)
    do = minval < MAX_RANK

    after_m = active & (subl > m[None, :])
    nxt = jnp.min(jnp.where(after_m, subl, BIG), axis=0)
    prv = jnp.max(jnp.where(active & (subl < m[None, :]), subl, -1), axis=0)
    nxt2 = jnp.min(jnp.where(active & (subl > nxt[None, :]), subl, BIG), axis=0)

    one_m = subl == m[None, :]
    one_n = subl == nxt[None, :]
    do_row = do[None, :]
    new_ids = jnp.where(one_m & do_row, minval[None, :], ids)
    new_active = active & ~(one_n & do_row)

    id_m = minval
    id_prv = at_sublane(ids, prv, MAX_RANK)
    id_nxt2 = at_sublane(ids, nxt2, MAX_RANK)
    # both neighbor-rank sites in one batched lookup (one row gather)
    found = pair_lookup_cat(
        jnp.stack([id_m, id_prv]), jnp.stack([id_nxt2, id_m]),
        pair_rows_cat, table_mask,
    )
    found = jnp.where(found < 0, MAX_RANK, found)
    rank_m = jnp.where(nxt2 <= W, found[0], MAX_RANK)
    rank_prv = jnp.where(prv >= 0, found[1], MAX_RANK)

    one_p = subl == prv[None, :]
    new_rank = jnp.where(one_m & do_row, rank_m[None, :], rank)
    new_rank = jnp.where(one_p & do_row, rank_prv[None, :], new_rank)
    new_rank = jnp.where(one_n & do_row, MAX_RANK, new_rank)
    return new_ids, new_rank, new_active


def rank_from_state(ids, active, pair_rows_cat, table_mask):
    """Pair ranks for a mid-merge [W, R] state: rank[w] = vocab rank of
    (span w, next active span in its column), MAX_RANK when absent. ONE
    full-matrix batched lookup; used to (re)enter the sequential engine
    after batched rounds or compaction."""
    W, R = ids.shape
    nxt_id = jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a),
        jnp.where(active, ids, -1), reverse=True, axis=0,
    )
    nxt_id = jnp.concatenate(
        [nxt_id[1:], jnp.full((1, R), -1, jnp.int32)], axis=0
    )
    found = pair_lookup_cat(ids, nxt_id, pair_rows_cat, table_mask)
    has = active & (nxt_id >= 0)
    return jnp.where(has & (found >= 0), found, MAX_RANK)


def merge_rows_t3(mat_t, lens, byte_to_id, byte_pair_id, pair_rows_cat,
                  table_mask, *, unroll: int | None = None):
    """Transposed merge with BOTH lookup sites and BOTH cuckoo probes of a
    round batched into ONE row gather (4 probe rows per column per round via
    :func:`pair_lookup_cat`), quartering the gather-op launches of
    :func:`merge_rows_t2`'s four independent probes. Semantics identical to
    the reference merge loop (``M/GptBytePairEncoding.java:200-275``).

    Returns (ids_t int32[W, R], active_t bool[W, R]).
    """
    W, R = mat_t.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    b = mat_t.astype(jnp.int32)

    active = subl < lens[None, :]
    ids = jnp.where(active, jnp.take(byte_to_id, b), -1)

    b_next = jnp.concatenate([b[1:, :], jnp.zeros((1, R), jnp.int32)], axis=0)
    is_pair = subl + 1 < lens[None, :]
    rank = jnp.where(is_pair, jnp.take(byte_pair_id, b * 256 + b_next), -1)
    rank = jnp.where(rank < 0, MAX_RANK, rank)

    def cond(state):
        return state[3]

    def body(state):
        ids, rank, active, _ = state
        ids, rank, active = t3_round(
            ids, rank, active, pair_rows_cat, table_mask
        )
        return ids, rank, active, jnp.any(jnp.min(rank) < MAX_RANK)

    k = _UNROLL if unroll is None else max(1, unroll)

    def body_k(state):
        for _ in range(k):
            state = body(state)
        return state

    init = (ids, rank, active, jnp.any(jnp.min(rank) < MAX_RANK))
    ids, rank, active, _ = jax.lax.while_loop(cond, body_k, init)
    return ids, active


def merge_rows_t(mat_t, lens, byte_to_id, byte_pair_id, cuckoo_u, cuckoo_v,
                 cuckoo_id, table_mask):
    """Transposed-layout merge: pieces along LANES, spans along sublanes.

    ``mat_t`` is uint8[W, R]: column r holds piece r's bytes in sublanes
    0..lens[r]-1. On TPU the last dim maps to the 128-wide lane dimension, so
    with R in the thousands every VPU op runs at full lane occupancy, and all
    per-piece reductions (argmin, neighbor scans) are native sublane
    reductions over W ≤ 4096 — this is the layout the hardware wants, unlike
    the naive [R, W] form which uses W/128 of each vector register.

    Semantics are identical to the reference merge loop
    (``M/GptBytePairEncoding.java:200-275``); see :func:`merge_rows`.

    Returns (ids_t int32[W, R], active_t bool[W, R]).
    """
    W, R = mat_t.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)  # sublane index
    b = mat_t.astype(jnp.int32)

    active = subl < lens[None, :]
    ids = jnp.where(active, jnp.take(byte_to_id, b), -1)

    b_next = jnp.concatenate([b[1:, :], jnp.zeros((1, R), jnp.int32)], axis=0)
    is_pair = subl + 1 < lens[None, :]
    rank = jnp.where(is_pair, jnp.take(byte_pair_id, b * 256 + b_next), -1)
    rank = jnp.where(rank < 0, MAX_RANK, rank)

    def lookup(u, v):
        found = pair_lookup(u, v, cuckoo_u, cuckoo_v, cuckoo_id, table_mask)
        return jnp.where(found < 0, MAX_RANK, found)

    BIG = jnp.int32(W + 1)

    def at_sublane(x, m, fill):
        """x[m[r], r] per column, via masked reduction (no gather)."""
        return jnp.min(jnp.where(subl == m[None, :], x, fill), axis=0)

    def cond(state):
        return state[3]

    def body(state):
        ids, rank, active, _ = state
        m = jnp.argmin(rank, axis=0).astype(jnp.int32)  # leftmost min
        minval = jnp.min(rank, axis=0)
        do = minval < MAX_RANK

        after_m = active & (subl > m[None, :])
        nxt = jnp.min(jnp.where(after_m, subl, BIG), axis=0)
        prv = jnp.max(jnp.where(active & (subl < m[None, :]), subl, -1), axis=0)
        nxt2 = jnp.min(jnp.where(active & (subl > nxt[None, :]), subl, BIG), axis=0)

        one_m = subl == m[None, :]
        one_n = subl == nxt[None, :]
        do_row = do[None, :]
        new_ids = jnp.where(one_m & do_row, minval[None, :], ids)
        new_active = active & ~(one_n & do_row)

        id_m = minval  # merged pair's rank == merged token id
        id_prv = at_sublane(ids, prv, MAX_RANK)
        id_nxt2 = at_sublane(ids, nxt2, MAX_RANK)
        rank_m = jnp.where(nxt2 <= W, lookup(id_m, id_nxt2), MAX_RANK)
        rank_prv = jnp.where(prv >= 0, lookup(id_prv, id_m), MAX_RANK)

        one_p = subl == prv[None, :]
        new_rank = jnp.where(one_m & do_row, rank_m[None, :], rank)
        new_rank = jnp.where(one_p & do_row, rank_prv[None, :], new_rank)
        new_rank = jnp.where(one_n & do_row, MAX_RANK, new_rank)

        any_left = jnp.any(jnp.min(new_rank) < MAX_RANK)
        return new_ids, new_rank, new_active, any_left

    init = (ids, rank, active, jnp.any(jnp.min(rank) < MAX_RANK))
    ids, rank, active, _ = jax.lax.while_loop(cond, body, init)
    return ids, active


def merge_rows(byte_mat, lens, byte_to_id, byte_pair_id, cuckoo_u, cuckoo_v,
               cuckoo_id, table_mask):
    """Run the full merge on a padded piece matrix.

    Args:
      byte_mat: uint8[R, L] piece bytes, zero-padded.
      lens: int32[R] piece byte lengths (<= L).
      byte_to_id / byte_pair_id / cuckoo_*: packed vocab tables (device).
      table_mask: python int, cuckoo table mask.

    Returns:
      ids: int32[R, L] token id per surviving span (junk at inactive lanes)
      active: bool[R, L] surviving span mask (count = tokens per piece)
    """
    R, L = byte_mat.shape
    lanes = jnp.arange(L, dtype=jnp.int32)[None, :]  # [1, L]
    b = byte_mat.astype(jnp.int32)

    active = lanes < lens[:, None]
    ids = jnp.where(active, jnp.take(byte_to_id, b), -1)

    # seed pair ranks: spans are single bytes, one gather into the 64K table
    b_next = jnp.concatenate([b[:, 1:], jnp.zeros((R, 1), jnp.int32)], axis=1)
    is_pair = lanes + 1 < lens[:, None]
    rank = jnp.where(
        is_pair, jnp.take(byte_pair_id, b * 256 + b_next), -1
    )
    rank = jnp.where(rank < 0, MAX_RANK, rank)

    def lookup(u, v):
        found = pair_lookup(u, v, cuckoo_u, cuckoo_v, cuckoo_id, table_mask)
        return jnp.where(found < 0, MAX_RANK, found)

    def cond(state):
        _ids, rank, _active, any_left = state
        return any_left

    def body(state):
        ids, rank, active, _ = state
        m = jnp.argmin(rank, axis=1)  # [R] leftmost min
        minval = jnp.take_along_axis(rank, m[:, None], axis=1)[:, 0]
        do = minval < MAX_RANK

        m_col = m[:, None]
        after_m = active & (lanes > m_col)
        nxt = jnp.min(jnp.where(after_m, lanes, L), axis=1)  # right span
        prv = jnp.max(jnp.where(active & (lanes < m_col), lanes, -1), axis=1)
        after_n = active & (lanes > nxt[:, None])
        nxt2 = jnp.min(jnp.where(after_n, lanes, L), axis=1)

        # merged token id == the pair rank (tiktoken rank == id)
        one_m = lanes == m_col
        one_n = lanes == nxt[:, None]
        do_col = do[:, None]
        new_ids = jnp.where(one_m & do_col, minval[:, None], ids)
        new_active = active & ~(one_n & do_col)

        # recompute the two affected neighbor ranks BEFORE "removal"
        # (reference :247-259); everything else keeps its rank.
        id_m = minval  # new id at lane m
        id_prv = jnp.take_along_axis(ids, jnp.maximum(prv, 0)[:, None], axis=1)[:, 0]
        id_nxt2 = jnp.take_along_axis(
            ids, jnp.minimum(nxt2, L - 1)[:, None], axis=1
        )[:, 0]
        rank_m = jnp.where(nxt2 < L, lookup(id_m, id_nxt2), MAX_RANK)
        rank_prv = jnp.where(prv >= 0, lookup(id_prv, id_m), MAX_RANK)

        one_p = lanes == prv[:, None]
        new_rank = jnp.where(one_m & do_col, rank_m[:, None], rank)
        new_rank = jnp.where(one_p & do_col, rank_prv[:, None], new_rank)
        new_rank = jnp.where(one_n & do_col, MAX_RANK, new_rank)

        any_left = jnp.any(jnp.min(new_rank) < MAX_RANK)
        return new_ids, new_rank, new_active, any_left

    init = (ids, rank, active, jnp.any(jnp.min(rank) < MAX_RANK))
    ids, rank, active, _ = jax.lax.while_loop(cond, body, init)
    return ids, active
