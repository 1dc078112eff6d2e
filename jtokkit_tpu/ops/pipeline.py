"""Single-jit full-device encode pipeline.

Everything between raw bytes and token ids runs inside ONE compiled XLA
program per chunk shape — no host round-trips mid-pipeline (critical: every
host↔device sync costs a tunnel RTT, and D2H is expensive):

    bytes[N], valid[N]
      → classify + piece boundaries           (ops/classify, ops/boundaries)
      → device packing: piece starts/lens → length buckets → padded matrices
      → exact merge per bucket                (ops/merge)
      → token scatter back to stream order
      → tokens[N], piece/doc counts

Bucket capacities are static and PROVABLY sufficient: bucket L holds pieces
of length in (L/2, L], and at most N/(L/2+1) < 2N/L such pieces fit in N
bytes; the smallest bucket (L=4) holds all pieces of length ≤ 4 and gets
capacity N/1... pieces are ≥1 byte so capacity N suffices. No overflow path
is needed — packing cannot fail.

Pieces longer than the largest bucket (4096 bytes of a single regex piece)
are vanishingly rare; they are detected via the returned ``oversize_count``
and handled by the caller on the host oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import boundaries, classify, merge

# (lane width, capacity as fraction N // div). Capacity rule: pieces in
# bucket L have length > previous lane width, so count <= N // (prev+1).
# Few buckets keep the compiled program small (each bucket unrolls its own
# merge while-loop); widths trade a little padded VPU work for that.
BUCKETS = (
    (8, 1),      # len 1..8    -> up to N pieces
    (32, 8),     # len 9..32   -> <= N/9
    (128, 32),   # len 33..128 -> <= N/33
    (512, 128),  # len 129..512
    (4096, 512), # len 513..4096
)
MAX_PIECE_LEN = BUCKETS[-1][0]


class ChunkResult(NamedTuple):
    tokens: jnp.ndarray        # int32[N] token ids, stream order, padded
    n_tokens: jnp.ndarray      # int32 scalar
    piece_count: jnp.ndarray   # int32 scalar (number of pieces)
    oversize_count: jnp.ndarray  # int32 scalar (pieces > MAX_PIECE_LEN)
    doc_counts: jnp.ndarray    # int32[D] tokens per document


def encode_chunk(
    buf: jnp.ndarray,          # uint8[N]
    valid: jnp.ndarray,        # bool[N] (False at doc separators / padding)
    doc_ends: jnp.ndarray,     # int32[D] byte end-offset of each document
    class_table: jnp.ndarray,
    pattern: str,
    byte_to_id: jnp.ndarray,
    byte_pair_id: jnp.ndarray,
    cuckoo_u: jnp.ndarray,
    cuckoo_v: jnp.ndarray,
    cuckoo_id: jnp.ndarray,
    table_mask: int,
) -> ChunkResult:
    N = buf.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)

    # ---- 1. boundaries ------------------------------------------------
    info = classify.classify_bytes(buf, class_table, valid)
    mask = boundaries.piece_starts(info, pattern)

    # ---- 2. piece table ----------------------------------------------
    n_pieces = mask.sum().astype(jnp.int32)
    starts = jnp.nonzero(mask, size=N, fill_value=N)[0].astype(jnp.int32)
    piece_valid = jnp.arange(N) < n_pieces

    # piece end = next start, clamped to the first invalid byte at/after it
    # (separators and padding are invalid; pieces never span them)
    next_invalid = jax.lax.associative_scan(
        jnp.minimum, jnp.where(valid, N, idx), reverse=True
    )
    next_start = jnp.concatenate([starts[1:], jnp.full((1,), N, jnp.int32)])
    start_clip = jnp.minimum(starts, N - 1)
    ends = jnp.minimum(next_start, next_invalid[start_clip])
    lens = jnp.where(piece_valid, ends - starts, 0).astype(jnp.int32)

    oversize = piece_valid & (lens > MAX_PIECE_LEN)
    oversize_count = oversize.sum().astype(jnp.int32)

    # document of each piece
    doc_of_piece = jnp.searchsorted(doc_ends, starts, side="right").astype(
        jnp.int32
    )
    doc_of_piece = jnp.minimum(doc_of_piece, doc_ends.shape[0] - 1)

    # ---- 3. bucket assignment + stable grouping ----------------------
    widths = jnp.asarray([w for w, _ in BUCKETS], jnp.int32)
    bucket_of = jnp.searchsorted(widths, lens, side="left").astype(jnp.int32)
    bucket_of = jnp.where(piece_valid & ~oversize, bucket_of, len(BUCKETS))

    # stable sort pieces by bucket: same-bucket pieces keep stream order
    order = jnp.argsort(bucket_of, stable=True).astype(jnp.int32)
    bucket_sizes = jnp.bincount(
        jnp.minimum(bucket_of, len(BUCKETS)), length=len(BUCKETS) + 1
    ).astype(jnp.int32)
    group_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bucket_sizes)[:-1].astype(jnp.int32)]
    )

    # ---- 4. per-bucket merge + count/scatter --------------------------
    counts = jnp.zeros((N,), jnp.int32)  # tokens per piece (piece order)
    out_ids_per_bucket = []

    for b, (lanes, div) in enumerate(BUCKETS):
        cap = max(N // div, 8)
        r = jnp.arange(cap, dtype=jnp.int32)
        # piece index of each column (stream-ordered within the bucket)
        p_idx = order[jnp.minimum(group_start[b] + r, N - 1)]
        col_live = r < bucket_sizes[b]
        p_start = jnp.where(col_live, starts[p_idx], 0)
        p_len = jnp.where(col_live, lens[p_idx], 0)

        # transposed layout: piece bytes along sublanes, pieces along lanes
        grows = jnp.arange(lanes, dtype=jnp.int32)[:, None]
        gidx = jnp.minimum(p_start[None, :] + grows, N - 1)
        mat_t = jnp.where(grows < p_len[None, :], buf[gidx], 0)

        ids, active = merge.merge_rows_t(
            mat_t, p_len, byte_to_id, byte_pair_id,
            cuckoo_u, cuckoo_v, cuckoo_id, table_mask,
        )
        col_counts = active.sum(axis=0).astype(jnp.int32)
        counts = counts.at[p_idx].add(jnp.where(col_live, col_counts, 0),
                                      mode="drop")
        out_ids_per_bucket.append((p_idx, col_live, ids, active))

    # ---- 5. token scatter to stream order -----------------------------
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    n_tokens = offsets[n_pieces]
    tokens = jnp.zeros((N,), jnp.int32)
    for p_idx, col_live, ids, active in out_ids_per_bucket:
        pos_in_piece = jnp.cumsum(active, axis=0).astype(jnp.int32) - 1
        tgt = offsets[p_idx][None, :] + pos_in_piece
        put = active & col_live[None, :]
        tgt = jnp.where(put, tgt, N)  # dropped
        tokens = tokens.at[tgt.reshape(-1)].set(
            ids.reshape(-1), mode="drop"
        )

    doc_counts = jnp.zeros((doc_ends.shape[0],), jnp.int32).at[
        doc_of_piece
    ].add(jnp.where(piece_valid, counts, 0), mode="drop")

    return ChunkResult(tokens, n_tokens, n_pieces, oversize_count, doc_counts)


def count_chunk(*args, **kwargs) -> jnp.ndarray:
    """Token count only (scalar outputs — minimal D2H)."""
    res = encode_chunk(*args, **kwargs)
    return res.n_tokens, res.oversize_count
