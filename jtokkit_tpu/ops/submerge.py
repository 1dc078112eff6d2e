"""VMEM-resident Pallas merge kernel over precomputed substring ranks.

The reference's merge-loop rank query is a SUBSTRING lookup: ``getRank``
hashes ``piece[parts[i].index : parts[i + skip + 2].index]`` against the
vocabulary (reference ``M/GptBytePairEncoding.java:285-300``). For a piece
of length L every rank the merge can ever query is therefore one of the
L·(L+1)/2 substrings — a closed, shape-static set. That turns the merge
into two phases that fit the TPU perfectly:

1. **Precompute (XLA)**: probe ALL substrings of every piece against the
   16-byte word table in ONE stacked row gather (the same exact-match
   cuckoo used for stage-A direct hits — every token of 1..16 bytes is in
   it, and bucket pieces are <= 16 bytes, so coverage is total). Output:
   ``rq[Q, cap]`` with Q = L·(L-1)/2 substring ranks (or -1), plus the
   single-byte ids. After this, no table lookups remain — the hash tables
   never enter the kernel.

2. **Merge kernel (Pallas)**: the entire merge loop runs in VMEM on
   [W, 128]-lane blocks — argmin, neighbor scans, and rank *reads* from
   the block's substring-rank tile via masked sublane reductions. One
   kernel launch replaces the XLA ``while_loop``'s per-round op dispatches,
   and each block exits as soon as its own 128 pieces are done.

Bit-exactness: the merge body mirrors ``ops.merge.merge_rows_t3`` (leftmost
min-rank merge, neighbor recompute before removal — reference
``M/GptBytePairEncoding.java:200-275``); only the lookup mechanics differ,
and substring ranks are by construction the same predicate as the
all-compositions pair table. The kernel also applies the whole-piece
direct hit (``:81-83``) — pieces routed here with an unverified stage-A
candidate still resolve exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# plain ints: jnp scalars would be captured as constants by the Pallas
# kernel closure, which pallas_call rejects
MAX_RANK = 0x7FFFFFFF
BIG_SENTINEL = 0x7FFFFFF0

_H1 = (0x9E3779B1, 0x85EBCA77, 0x2C1B3C6D)
_H2 = (0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)
_LEN_MIX = 0x01000193
_W2_MIX = 0x7FEB352D
_W3_MIX = 0x846CA68B

MAX_LANES = 16  # substring count is O(W^2); wider buckets stay on the
                # sequential-step engine (ops/merge.py)


def _mix(u, v, consts, mask):
    a, b, c = (jnp.uint32(x) for x in consts)
    h = (u.astype(jnp.uint32) * a) ^ (v.astype(jnp.uint32) * b)
    h = h ^ (h >> 15)
    h = h * c
    h = h ^ (h >> 13)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def n_substrings(W: int) -> int:
    """Number of (offset, len>=2) substrings of a width-W piece."""
    return W * (W - 1) // 2


def _q_offsets(W: int):
    """Static row offset of each length group in the rq array.

    Rows are grouped by substring length l = 2..W; group l holds offsets
    a = 0..W-l (its substring is [a, a+l)). offset(l) = sum_{j=2}^{l-1}
    (W+1-j); q(a, l) = offset(l) + a.
    """
    offs = {}
    pos = 0
    for l in range(2, W + 1):
        offs[l] = pos
        pos += W - l + 1
    return offs, pos


def substring_ranks(mat_t, c_len, word_rows_cat, word_mask):
    """Ranks of ALL >=2-byte substrings of every piece; one stacked probe.

    Args:
      mat_t: uint8[W, cap] piece bytes, bytes along sublanes, zero-padded.
      c_len: int32[cap] piece lengths (<= W <= 16).
      word_rows_cat: int32[2S, 8] stacked word-table rows
        (w0..w3, len<<20|id, pad...), as built by the device engine.
      word_mask: python int, word-table mask.

    Returns rq int32[Q, cap]: vocab id of substring q (grouped by length,
    see :func:`_q_offsets`), or -1 when not a token / out of piece bounds.
    """
    W, cap = mat_t.shape
    assert W <= MAX_LANES
    offs, Q = _q_offsets(W)

    b32 = mat_t.astype(jnp.uint32)
    ext = jnp.concatenate([b32, jnp.zeros((15, cap), jnp.uint32)], axis=0)

    def words(k):
        return (
            ext[k : k + W]
            | (ext[k + 1 : k + 1 + W] << 8)
            | (ext[k + 2 : k + 2 + W] << 16)
            | (ext[k + 3 : k + 3 + W] << 24)
        )

    W0, W1, W2, W3 = words(0), words(4), words(8), words(12)  # [W, cap] u32

    def lmask(l: int, lo: int):
        bits = min(max(l - lo, 0), 4) * 8
        return jnp.uint32(0xFFFFFFFF if bits >= 32 else (1 << bits) - 1)

    q_parts = {0: [], 1: [], 2: [], 3: []}
    ends = []
    for l in range(2, W + 1):
        n = W - l + 1
        q_parts[0].append(W0[:n] & lmask(l, 0))
        q_parts[1].append(W1[:n] & lmask(l, 4))
        q_parts[2].append(W2[:n] & lmask(l, 8))
        q_parts[3].append(W3[:n] & lmask(l, 12))
        ends.append(np.arange(n, dtype=np.int32) + l)
    qw = [jnp.concatenate(p, axis=0).astype(jnp.int32) for p in q_parts.values()]
    q_end = jnp.asarray(np.concatenate(ends))          # [Q]
    q_len = jnp.asarray(
        np.concatenate([
            np.full(W - l + 1, l, np.int32) for l in range(2, W + 1)
        ])
    )

    hu = (
        qw[0].astype(jnp.uint32)
        ^ (qw[2].astype(jnp.uint32) * jnp.uint32(_W2_MIX))
    ).astype(jnp.int32)
    hv = (
        qw[1].astype(jnp.uint32)
        ^ (q_len[:, None].astype(jnp.uint32) * jnp.uint32(_LEN_MIX))
        ^ (qw[3].astype(jnp.uint32) * jnp.uint32(_W3_MIX))
    )
    s1 = _mix(hu, hv, _H1, word_mask)
    s2 = _mix(hu, hv, _H2, word_mask)
    S = word_mask + 1
    # probe each constant-folded table half (row-count gather cliff at
    # ~2^17 rows; the stacked [2S, 8] table pays ~3.6x per row)
    r = jnp.stack([
        jnp.take(word_rows_cat[:S], s1, axis=0, mode="clip"),
        jnp.take(word_rows_cat[S:], s2, axis=0, mode="clip"),
    ])                                                     # [2, Q, cap, 8]
    ok = (
        (r[..., 0] == qw[0][None]) & (r[..., 1] == qw[1][None])
        & (r[..., 2] == qw[2][None]) & (r[..., 3] == qw[3][None])
        & (r[..., 4] >> 20 == q_len[None, :, None]) & (r[..., 4] >= 0)
    )
    rank = jnp.where(ok[0], r[0, ..., 4] & 0xFFFFF, -1)
    rank = jnp.where((rank < 0) & ok[1], r[1, ..., 4] & 0xFFFFF, rank)
    valid = q_end[:, None] <= c_len[None, :]
    return jnp.where(valid, rank, -1)


def _offset_of_len(l, W: int):
    """Traced version of _q_offsets: offset(l) = (l-2)(W+1) - (l(l-1)/2 - 1)."""
    return (l - 2) * (W + 1) - ((l * (l - 1)) // 2 - 1)


def _merge_kernel(rq_ref, bid_ref, len_ref, ids_ref, act_ref, *, W: int,
                  Q: int):
    """One [*, 128]-lane block: the full merge loop in VMEM."""
    rq = rq_ref[...]            # [Q, 128] substring ranks (or -1)
    bid = bid_ref[...]          # [W, 128] single-byte ids
    ln = len_ref[0, :]          # [128]
    R = rq.shape[1]
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    qi = jax.lax.broadcasted_iota(jnp.int32, (Q, R), 0)

    def rd_read(x, e):
        """Rank of substring [x, e) per lane; -1 when absent/invalid."""
        l = e - x
        q = _offset_of_len(l, W) + x
        q = jnp.where((l >= 2) & (x >= 0) & (e <= W), q, -1)
        sub = jnp.min(
            jnp.where(qi == q[None, :], rq, BIG_SENTINEL), axis=0
        )
        one = jnp.min(
            jnp.where(wi == jnp.where(l == 1, x, -1)[None, :], bid,
                      BIG_SENTINEL),
            axis=0,
        )
        r = jnp.where(l == 1, one, sub)
        return jnp.where(r == BIG_SENTINEL, -1, r)

    active = wi < ln[None, :]
    # initial ranks: l=2 substrings live in rq rows 0..W-2 (offset(2)=0);
    # static slice + select instead of a ragged concat (Mosaic legality)
    r2 = jnp.where(wi < W - 1, rq[0:W], -1)
    rank = jnp.where((wi + 1 < ln[None, :]) & (r2 >= 0), r2, MAX_RANK)

    # whole-piece direct hit (reference M/GptBytePairEncoding.java:81-83):
    # collapse to a single span up front; the merge loop then no-ops
    whole = rd_read(jnp.zeros((R,), jnp.int32), ln)
    is_tok = (whole >= 0) & (ln >= 2)
    active = active & ((wi == 0) | ~is_tok[None, :])
    rank = jnp.where(is_tok[None, :], MAX_RANK, rank)

    BIG = jnp.int32(W + 1)

    def cond(state):
        rank, _active = state
        return jnp.min(rank) < MAX_RANK

    def body(state):
        # the active mask rides the carry as int32: Mosaic cannot legalize a
        # bool-vector scf.yield in the while loop
        rank, active_i = state
        active = active_i > 0
        minval = jnp.min(rank, axis=0)
        m = jnp.min(jnp.where(rank == minval[None, :], wi, BIG), axis=0)
        do = minval < MAX_RANK

        after_m = active & (wi > m[None, :])
        nxt = jnp.min(jnp.where(after_m, wi, BIG), axis=0)
        prv = jnp.max(jnp.where(active & (wi < m[None, :]), wi, -1), axis=0)
        nxt2 = jnp.min(jnp.where(active & (wi > nxt[None, :]), wi, BIG),
                       axis=0)
        nxt3 = jnp.min(jnp.where(active & (wi > nxt2[None, :]), wi, BIG),
                       axis=0)

        e_m = jnp.where(nxt3 <= W, nxt3, ln)
        e_p = jnp.where(nxt2 <= W, nxt2, ln)
        rm = rd_read(m, e_m)
        rp = rd_read(prv, e_p)
        rank_m = jnp.where((nxt2 <= W) & (rm >= 0), rm, MAX_RANK)
        rank_prv = jnp.where((prv >= 0) & (rp >= 0), rp, MAX_RANK)

        one_m = wi == m[None, :]
        one_n = wi == nxt[None, :]
        one_p = wi == prv[None, :]
        do_r = do[None, :]
        new_active = active & ~(one_n & do_r)
        new_rank = jnp.where(one_m & do_r, rank_m[None, :], rank)
        new_rank = jnp.where(one_p & do_r, rank_prv[None, :], new_rank)
        new_rank = jnp.where(one_n & do_r, MAX_RANK, new_rank)
        return new_rank, new_active.astype(jnp.int32)

    rank, active_i = jax.lax.while_loop(
        cond, body, (rank, active.astype(jnp.int32))
    )
    active = active_i > 0

    # surviving-span ids: span at i covers [i, next active boundary or len).
    # Sublane rolls instead of concatenation (Mosaic rejects the bool-vector
    # register cast a ragged concat needs); wrapped rows are masked out.
    from jax.experimental.pallas import tpu as pltpu

    act32 = active.astype(jnp.int32)
    nxt_of = jnp.full((W, R), BIG, jnp.int32)
    for k in range(1, W):
        rolled = pltpu.roll(act32, W - k, axis=0)  # rolled[i] = act[i + k]
        cand = (wi + k <= W - 1) & (rolled > 0)
        nxt_of = jnp.minimum(nxt_of, jnp.where(cand, wi + k, BIG))
    e_i = jnp.where(nxt_of <= W - 1, nxt_of, ln[None, :])
    # per-sublane reads folded in via selects (Mosaic lowers neither scatter
    # nor ragged vector concats)
    ids = jnp.full((W, R), -1, jnp.int32)
    for i in range(W):
        row = rd_read(jnp.full((R,), i, jnp.int32), e_i[i])
        ids = jnp.where(wi == i, row[None, :], ids)
    ids_ref[...] = jnp.where(active, ids, -1)
    act_ref[...] = active.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _submerge_call(rq, bid, c_len, *, W: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, cap = rq.shape
    assert cap % 128 == 0
    grid = cap // 128
    ln2 = c_len.reshape(1, cap)

    def im(g):
        return (0, g)

    ids, act = pl.pallas_call(
        functools.partial(_merge_kernel, W=W, Q=Q),
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((W, cap), jnp.int32),
            jax.ShapeDtypeStruct((W, cap), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((Q, 128), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 128), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), im, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W, 128), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 128), im, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rq, bid, ln2)
    return ids, act


def merge_bucket_sub(
    buf, starts, lens, miss_sorted, group_start_b, count_b,
    byte_to_id, word_rows_cat, word_mask,
    *, lanes: int, cap: int, interpret: bool = False,
):
    """Drop-in bucket merge via substring precompute + the Pallas kernel.

    Same contract as :func:`jtokkit_tpu.ops.pipeline.merge_bucket_v3`:
    returns (cols int32[cap], ids int32[lanes, cap], active bool[lanes, cap]).
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

    rq = substring_ranks(mat_t, c_len, word_rows_cat, word_mask)
    bid = jnp.take(byte_to_id, mat_t.astype(jnp.int32))
    ids, act = _submerge_call(rq, bid, c_len, W=lanes, interpret=interpret)
    return cols, ids, (act > 0) & live[None, :]
