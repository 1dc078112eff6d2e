"""Exact batched byte-pair merge: many merges per piece per round.

Replaces the one-merge-per-piece-per-round fixed point (the v1 device merge)
with a provably sequential-equivalent batched rule, validated bit-exactly
against the host oracle in ``scripts/sim_safe_merge.py`` (reference
semantics: ``M/GptBytePairEncoding.java:200-275`` — leftmost min-rank merge
with neighbor recompute).

Rule. Pair p = (B, C) with rank r, current left neighbor chain (Z, A) and
right neighbor chain (D, E), merges this round iff ALL hold:

  L1: no current pair (A, B), or rank(A, B) > r        [tie → left first]
  L2: B can never be consumed from the left earlier:
      - no A ever (piece-first) → pass; no Z ever → pass (X = ZA impossible)
      - explicit 2-hop: NOT (rank(Z, A) <= r AND rank(ZA, B) <= r)
      - deeper (X strictly containing ZA): r < minR_gt[B][len(Z) + len(A)]
  R1: no current pair (C, D), or rank(C, D) >= r       [tie → p is leftmost]
  R2: mirror of L2 with strict/non-strict flipped:
      - no D → pass; no E → pass
      - NOT (rank(D, E) < r AND rank(C, DE) < r)
      - r <= minL_gt[C][len(D) + len(E)]

L1-vs-L1 of adjacent pairs is contradictory, so the merge set is
overlap-free by construction. Columns where no pair passes merge their
leftmost min-rank pair (the sequential step) so every piece with a
mergeable pair progresses every round. The deeper bounds ride the 32-bit
safety masks packed per pair entry (``vocab/tables.py``), so they cost
nothing beyond the rank lookup; rounds cost 3 pair lookups (main, ZA, CDE)
plus seven column scans.

Round 1 runs on bytes: ranks + l=1 safety bits come from the 64K
``byte_pair_seed`` table in one gather, neighbors are adjacent sublanes,
and maximal equal-rank runs (whitespace/repeated chars) merge pairwise by
chain parity with a prefix-AND guard — exactly the sequential outcome.

Long buckets interleave merge phases with width-halving compaction
(``lax.sort`` partition per column): spans only die, so after a few rounds
the live matrix is a fraction of the padded piece length; compaction keeps
per-round cost proportional to survivors. A phase exits when every column
fits the next width or nothing merged (= done, since the forced min fires
whenever any mergeable pair exists); finished state is emitted exactly once
across phases.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from . import colscan

MAX_RANK = jnp.int32(0x7FFFFFFF)
LEN_CLAMP = 16  # == vocab.tables.SAFE_LMAX
_OFF_BITS = 12  # span offsets < 4096 (largest bucket width)

_H1 = (0x9E3779B1, 0x85EBCA77, 0x2C1B3C6D)
_H2 = (0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _mix(u, v, consts, mask):
    a, b, c = (jnp.uint32(x) for x in consts)
    h = (u.astype(jnp.uint32) * a) ^ (v.astype(jnp.uint32) * b)
    h = h ^ (h >> 15)
    h = h * c
    h = h ^ (h >> 13)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def pair_lookup_safe(u, v, pair_rows0, pair_rows1, table_mask):
    """(u, v) -> (merged id or -1, packed safety mask). Two row gathers;
    rows are int32[T, 4] = (u, v, id, safe)."""
    s1 = _mix(u, v, _H1, table_mask)
    s2 = _mix(u, v, _H2, table_mask)
    r1 = jnp.take(pair_rows0, s1, axis=0, mode="clip")
    r2 = jnp.take(pair_rows1, s2, axis=0, mode="clip")
    hit1 = (r1[..., 0] == u) & (r1[..., 1] == v)
    hit2 = (r2[..., 0] == u) & (r2[..., 1] == v)
    out_id = jnp.where(hit1, r1[..., 2], -1)
    out_id = jnp.where(hit2, r2[..., 2], out_id)
    out_safe = jnp.where(hit1, r1[..., 3], 0)
    out_safe = jnp.where(hit2, r2[..., 3], out_safe)
    return out_id, out_safe


def _shift_down(x, fill):
    return jnp.concatenate(
        [jnp.full((1, x.shape[1]), fill, x.dtype), x[:-1]], axis=0
    )


def _shift_up(x, fill):
    return jnp.concatenate(
        [x[1:], jnp.full((1, x.shape[1]), fill, x.dtype)], axis=0
    )


def _safe_bit(safe, side: int, lsum):
    """Bit test of the packed safety mask: side 0 = L (bits 0..15, strict
    r < minR_gt), side 1 = R (bits 16..31, r <= minL_gt); lsum clamped."""
    shift = (16 * side + jnp.clip(lsum, 1, LEN_CLAMP) - 1).astype(jnp.int32)
    u = safe.astype(jnp.uint32) >> shift.astype(jnp.uint32)
    return (u & jnp.uint32(1)).astype(jnp.int32) == 1


def round1_bytes(mat_t, col_len, byte_to_id, byte_pair_seed):
    """Byte-level first round: seed ranks + l=1 safety in one gather,
    adjacent-sublane neighbors, equal-rank chain parity.

    Returns (ids, lenc, off, active, progress, counts).
    """
    W, R = mat_t.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    b = mat_t.astype(jnp.int32)
    active = subl < col_len[None, :]
    ids = jnp.where(active, jnp.take(byte_to_id, b), -1)
    off = subl

    b_next = _shift_up(b, 0)
    is_pair = subl + 1 < col_len[None, :]
    seed = jnp.take(byte_pair_seed, b * 256 + b_next, mode="clip")
    rank = jnp.where(is_pair & (seed >= 0), seed & 0x3FFFF, MAX_RANK)
    s_l = (seed >> 18) & 1
    s_r = (seed >> 19) & 1

    r_prv = _shift_down(rank, MAX_RANK)
    r_nxt = _shift_up(rank, MAX_RANK)
    valid = rank < MAX_RANK
    l1 = (subl == 0) | (r_prv > rank)
    l2 = (subl <= 1) | (s_l == 1)
    r1 = r_nxt >= rank
    r2 = (subl + 2 >= col_len[None, :]) | (s_r == 1)
    base = valid & l2 & r1 & r2

    # equal-rank chains: heads are every non-eqL position (invalid positions
    # are their own heads, so propagation never crosses pieces or gaps)
    eq_l = (subl > 0) & (r_prv == rank) & valid
    head_leaf = jnp.where(~eq_l, subl, -1)
    (head_pos,) = colscan.col_scan([head_leaf], ["last"])
    even = ((subl - head_pos) % 2) == 0

    fail_leaf = jnp.where(even & ~base, 1, 0)
    (fail_incl,) = colscan.col_scan([fail_leaf], ["add"])
    fail_excl = _shift_down(fail_incl, 0)
    # propagate (fails before head, head's L1) from each head
    ref_leaf = jnp.where(~eq_l, fail_excl * 2 + l1.astype(jnp.int32), -1)
    (ref,) = colscan.col_scan([ref_leaf], ["last"])

    do = base & even & ((ref & 1) == 1) & ((ref >> 1) == fail_excl)

    # forced sequential step (same as the general rounds): keeps `progress ==
    # False` equivalent to `no mergeable pair anywhere`
    col_any = jnp.any(do, axis=0)
    minval = jnp.min(rank, axis=0)
    m = jnp.argmin(rank, axis=0).astype(jnp.int32)
    force = (~col_any) & (minval < MAX_RANK)
    do = do | (force[None, :] & (subl == m[None, :]))

    consumed = active & (_shift_down(do, False))
    new_ids = jnp.where(do, rank, ids)
    lenc = jnp.where(do, 2, 1)
    new_active = active & ~consumed
    counts = new_active.sum(axis=0).astype(jnp.int32)
    return new_ids, lenc, off, new_active, jnp.any(do), counts


def _general_round(ids, lenc, off, active, pair_rows0, pair_rows1,
                   table_mask):
    """One exact batched round at token level.

    Returns (ids, lenc, active, progress, counts).
    """
    pack = jnp.where(active, ids * 32 + lenc, -1)
    (prv_pack,) = colscan.excl_fwd([pack], ["last"])
    (nxt_pack,) = colscan.excl_rev([pack], ["last"])
    nxt_id = jnp.where(nxt_pack >= 0, nxt_pack >> 5, -1)
    nxt_len = nxt_pack & 31
    has_pair = active & (nxt_pack >= 0)

    r_raw, safe = pair_lookup_safe(
        ids, nxt_id, pair_rows0, pair_rows1, table_mask
    )
    rank = jnp.where(has_pair & (r_raw >= 0), r_raw, MAX_RANK)

    rank_leaf = jnp.where(active, rank, -1)
    prv2_leaf = jnp.where(active, prv_pack, -1)
    rank_prv, prv2_pack = colscan.excl_fwd(
        [rank_leaf, prv2_leaf], ["last", "last"]
    )
    nxt2_leaf = jnp.where(active, nxt_pack, -1)
    rank_nxt, nxt2_pack = colscan.excl_rev(
        [rank_leaf, nxt2_leaf], ["last", "last"]
    )
    (rank_prv2,) = colscan.excl_fwd(
        [jnp.where(active, rank_prv, -1)], ["last"]
    )
    rank_nxt2, nxt3_pack = colscan.excl_rev(
        [jnp.where(active, rank_nxt, -1), jnp.where(active, nxt2_pack, -1)],
        ["last", "last"],
    )

    # 2-hop explicit candidates: (ZA, B) and (C, DE). MAX/-1 operands
    # naturally miss in the cuckoo tables.
    za_raw, _ = pair_lookup_safe(
        rank_prv2, ids, pair_rows0, pair_rows1, table_mask
    )
    za_rank = jnp.where(za_raw >= 0, za_raw, MAX_RANK)
    de_raw, _ = pair_lookup_safe(
        nxt_id, rank_nxt2, pair_rows0, pair_rows1, table_mask
    )
    de_rank = jnp.where(de_raw >= 0, de_raw, MAX_RANK)

    no_a = prv_pack < 0
    no_z = prv2_pack < 0
    len_a = prv_pack & 31
    len_z = prv2_pack & 31
    l1 = no_a | (rank_prv > rank)
    za_ok = (rank_prv2 < 0) | (rank_prv2 > rank) | (za_rank > rank)
    l2 = no_a | no_z | (_safe_bit(safe, 0, len_z + len_a) & za_ok)

    no_d = nxt2_pack < 0
    no_e = nxt3_pack < 0
    len_d = nxt2_pack & 31
    len_e = nxt3_pack & 31
    r1 = no_d | (rank_nxt >= rank)
    de_ok = (rank_nxt2 < 0) | (rank_nxt2 >= rank) | (de_rank >= rank)
    r2 = no_d | no_e | (_safe_bit(safe, 1, len_d + len_e) & de_ok)

    valid = rank < MAX_RANK
    do = valid & l1 & l2 & r1 & r2

    # forced sequential step for columns with mergeable pairs but no batched
    # merge (leftmost min — exactly the reference's next merge)
    col_any = jnp.any(do, axis=0)
    minval = jnp.min(rank, axis=0)
    m = jnp.argmin(rank, axis=0).astype(jnp.int32)
    force = (~col_any) & (minval < MAX_RANK)
    subl = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    do = do | (force[None, :] & (subl == m[None, :]))

    (do_prv,) = colscan.excl_fwd(
        [jnp.where(active, do.astype(jnp.int32), -1)], ["last"]
    )
    consumed = active & (do_prv == 1)
    new_ids = jnp.where(do, rank, ids)
    new_lenc = jnp.where(do, jnp.minimum(lenc + nxt_len, LEN_CLAMP), lenc)
    new_active = active & ~consumed
    counts = new_active.sum(axis=0).astype(jnp.int32)
    return new_ids, new_lenc, new_active, jnp.any(do), counts


def _compact(ids, lenc, off, active, w_new: int):
    """Stable partition of live spans to the top w_new sublanes (per column).

    Callers guarantee every column's live count <= w_new (phase exit
    condition or an all-done emit beforehand).
    """
    W, R = ids.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    key = jnp.where(active, subl, subl + W)
    pay_b = lenc * (1 << _OFF_BITS) + off
    _, s_ids, s_b = jax.lax.sort(
        (key, ids, pay_b), dimension=0, num_keys=1
    )
    counts = active.sum(axis=0).astype(jnp.int32)
    ids2 = s_ids[:w_new]
    lenc2 = s_b[:w_new] >> _OFF_BITS
    off2 = s_b[:w_new] & ((1 << _OFF_BITS) - 1)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (w_new, R), 0)
    active2 = sub2 < counts[None, :]
    return ids2, lenc2, off2, active2


def phase_chain(lanes: int) -> Tuple[int, ...]:
    """Compaction width schedule for a bucket of the given lane width."""
    chain = [lanes]
    w = lanes
    while w > 32:
        w = max(w // 2, 32)
        chain.append(w)
    return tuple(chain)


def merge_bucket_exact(
    buf, starts, lens, miss_sorted, group_start_b, count_b,
    byte_to_id, byte_pair_seed, pair_rows0, pair_rows1, table_mask,
    *, lanes: int, cap: int,
) -> Tuple[jnp.ndarray, List[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Merge one bucket's pieces with the exact batched engine.

    Returns (cols int32[cap] piece indices, outs) where outs is a list of
    (ids int32[W_k, cap], active bool[W_k, cap]) per phase; each piece's
    surviving spans appear in exactly one phase output, in byte order.
    """
    n = buf.shape[0]
    m_cap = miss_sorted.shape[0]
    r_iota = jnp.arange(cap, dtype=jnp.int32)
    take = jnp.minimum(group_start_b + r_iota, m_cap - 1)
    cols = miss_sorted[take]
    live = r_iota < count_b
    c_start = jnp.where(live, starts[cols], 0)
    c_len = jnp.where(live, lens[cols], 0)

    grows = jnp.arange(lanes, dtype=jnp.int32)[:, None]
    gidx = jnp.minimum(c_start[None, :] + grows, n - 1)
    mat_t = jnp.where(grows < c_len[None, :], buf[gidx], 0)

    ids, lenc, off, active, alive, counts = round1_bytes(
        mat_t, c_len, byte_to_id, byte_pair_seed
    )

    chain = phase_chain(lanes)
    outs: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for k, w in enumerate(chain):
        w_next = chain[k + 1] if k + 1 < len(chain) else None
        if k > 0:
            ids, lenc, off, active = _compact(ids, lenc, off, active, w)

        def body(state):
            ids, lenc, off, active, _alive, _counts = state
            ids, lenc, active, alive, counts = _general_round(
                ids, lenc, off, active, pair_rows0, pair_rows1, table_mask
            )
            return ids, lenc, off, active, alive, counts

        if w_next is None:
            def cond(state):
                return state[4]
        else:
            def cond(state, _wn=w_next):
                return state[4] & (jnp.max(state[5]) > _wn)

        ids, lenc, off, active, alive, counts = jax.lax.while_loop(
            cond, body, (ids, lenc, off, active, alive, counts)
        )
        # emit everything once the run is globally done (alive == False ⇔ no
        # mergeable pair anywhere: the forced step fires otherwise); the
        # final phase always emits the remainder
        emit = ~alive if w_next is not None else jnp.bool_(True)
        outs.append((ids, active & emit & live[None, :]))
        active = active & ~emit
    return cols, outs
