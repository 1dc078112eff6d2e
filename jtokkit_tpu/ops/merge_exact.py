"""Wide-bucket hybrid merge: batched byte round + compacting sequential.

Long regex pieces (CJK letter runs of ~270-600 bytes, punctuation runs)
make the plain sequential-step merge quadratic-ish: rounds ~ piece bytes,
each round touching the full static [W, cap] matrix. This engine cuts both
factors while staying bit-exact with the reference merge loop
(``M/GptBytePairEncoding.java:200-275``):

1. **Batched byte round** (:func:`round1_bytes`): every byte pair whose
   rank provably precedes all possible competitors merges simultaneously.
   Safety rides the ``byte_pair_seed`` table's precomputed l=1 threat bits
   (``vocab/tables.py``); equal-rank runs (whitespace/repeated chars)
   merge pairwise by chain parity with a prefix-AND guard — exactly the
   sequential outcome. On CJK text this one round performs the ~60% of
   all merges that assemble multi-byte characters, shrinking live spans
   to ~40%.
2. **Sequential rounds with width-halving compaction**: the remaining
   merges run the reference one-merge-per-piece-per-round step
   (:func:`jtokkit_tpu.ops.merge.t3_round` — the SAME code path as the
   narrow-bucket engine, per-round lookup cost ∝ cap, not W·cap). After
   the batched round the per-piece span counts fit half the width, so the
   state compacts [W] → [W/2] → ... → [32] (stable per-column partition),
   and late rounds touch a fraction of the original matrix. Each phase
   exits when every column fits the next width (or nothing remains to
   merge), so compaction can never drop a live span.

A previous revision ran BATCHED rounds beyond round 1 (per-pair safety
from packed threat masks + 2-hop refinements). It was bit-exact but paid
3 full-matrix cuckoo lookups per round — measured 1.75 MB/s merge-only on
CJK-shaped buckets vs ~10x that for the sequential step whose per-round
lookups are [2, cap]. The hybrid keeps batching only where it is free
(the seed-table byte round) and lets compaction kill the tail.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from . import colscan, merge

MAX_RANK = jnp.int32(0x7FFFFFFF)


def round1_bytes(mat_t, col_len, byte_to_id, byte_pair_seed):
    """Byte-level first round: seed ranks + l=1 safety in one gather,
    adjacent-sublane neighbors, equal-rank chain parity.

    Returns (ids, active, progress, counts).
    """
    W, R = mat_t.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    b = mat_t.astype(jnp.int32)
    active = subl < col_len[None, :]
    ids = jnp.where(active, jnp.take(byte_to_id, b), -1)

    b_next = jnp.concatenate(
        [b[1:, :], jnp.zeros((1, R), jnp.int32)], axis=0
    )
    is_pair = subl + 1 < col_len[None, :]
    seed = jnp.take(byte_pair_seed, b * 256 + b_next, mode="clip")
    rank = jnp.where(is_pair & (seed >= 0), seed & 0x3FFFF, MAX_RANK)
    s_l = (seed >> 18) & 1
    s_r = (seed >> 19) & 1

    r_prv = jnp.concatenate(
        [jnp.full((1, R), MAX_RANK, rank.dtype), rank[:-1]], axis=0
    )
    r_nxt = jnp.concatenate(
        [rank[1:], jnp.full((1, R), MAX_RANK, rank.dtype)], axis=0
    )
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
    fail_excl = jnp.concatenate(
        [jnp.zeros((1, R), jnp.int32), fail_incl[:-1]], axis=0
    )
    # propagate (fails before head, head's L1) from each head
    ref_leaf = jnp.where(~eq_l, fail_excl * 2 + l1.astype(jnp.int32), -1)
    (ref,) = colscan.col_scan([ref_leaf], ["last"])

    do = base & even & ((ref & 1) == 1) & ((ref >> 1) == fail_excl)

    # forced sequential step: keeps `progress == False` equivalent to
    # `no mergeable pair anywhere`
    col_any = jnp.any(do, axis=0)
    minval = jnp.min(rank, axis=0)
    m = jnp.argmin(rank, axis=0).astype(jnp.int32)
    force = (~col_any) & (minval < MAX_RANK)
    do = do | (force[None, :] & (subl == m[None, :]))

    consumed = active & jnp.concatenate(
        [jnp.zeros((1, R), jnp.bool_), do[:-1]], axis=0
    )
    new_ids = jnp.where(do, rank, ids)
    new_active = active & ~consumed
    counts = new_active.sum(axis=0).astype(jnp.int32)
    return new_ids, new_active, jnp.any(do), counts


def _compact(ids, rank, active, w_new: int):
    """Stable per-column partition of live spans into the top w_new
    sublanes, carrying (ids, rank). Adjacency among live spans is
    preserved, so carried pair ranks stay valid. Callers guarantee every
    column's live count <= w_new (phase exit condition)."""
    W, R = ids.shape
    subl = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    key = jnp.where(active, subl, subl + W)
    _, s_ids, s_rank = jax.lax.sort(
        (key, ids, rank), dimension=0, num_keys=1
    )
    counts = active.sum(axis=0).astype(jnp.int32)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (w_new, R), 0)
    active2 = sub2 < counts[None, :]
    rank2 = jnp.where(active2, s_rank[:w_new], MAX_RANK)
    return s_ids[:w_new], rank2, active2


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
    byte_to_id, byte_pair_seed, pair_rows_cat, table_mask,
    *, lanes: int, cap: int,
) -> Tuple[jnp.ndarray, List[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Merge one wide bucket's pieces with the hybrid engine.

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

    ids, active, alive, counts = round1_bytes(
        mat_t, c_len, byte_to_id, byte_pair_seed
    )
    rank = merge.rank_from_state(ids, active, pair_rows_cat, table_mask)

    chain = phase_chain(lanes)
    outs: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for k, w in enumerate(chain):
        w_next = chain[k + 1] if k + 1 < len(chain) else None
        if k > 0:
            ids, rank, active = _compact(ids, rank, active, w)

        def body(state):
            ids, rank, active, _alive, _counts = state
            ids, rank, active = merge.t3_round(
                ids, rank, active, pair_rows_cat, table_mask
            )
            counts = active.sum(axis=0).astype(jnp.int32)
            return (ids, rank, active,
                    jnp.min(rank) < MAX_RANK, counts)

        if w_next is None:
            def cond(state):
                return state[3]
        else:
            def cond(state, _wn=w_next):
                return state[3] & (jnp.max(state[4]) > _wn)

        alive0 = jnp.min(rank) < MAX_RANK
        ids, rank, active, alive, counts = jax.lax.while_loop(
            cond, body, (ids, rank, active, alive0, counts)
        )
        # emit everything once the run is globally done (alive == False ⇔
        # no mergeable pair anywhere); the final phase emits the remainder
        emit = ~alive if w_next is not None else jnp.bool_(True)
        outs.append((ids, active & emit & live[None, :]))
        active = active & ~emit
    return cols, outs
