"""Device decode: token ids → UTF-8 bytes as a gather over the packed
token-byte pool (reference decode walks a reverse HashMap per token,
``M/GptBytePairEncoding.java:137-151``; here every output byte is produced
in parallel).

Formulation: scatter each token's ordinal at its output start position,
propagate with a running max (the Pallas block-carry scan kernel on TPU,
~0.4 ms per 1M elements), then one gather from the byte pool. The previous
formulation ran ``searchsorted`` per output byte — ~90 ms per 1M queries on
v5e (see docs/perf-notes.md), ~200x slower than the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import pallas_scan


def decode_tokens(
    tokens: jnp.ndarray,      # int32[T] token ids (may include padding = -1)
    n_tokens,                 # traced scalar: number of valid tokens
    token_offsets: jnp.ndarray,  # int32[V+1]
    token_bytes: jnp.ndarray,    # uint8[pool]
    out_capacity: int,
):
    """Returns (out uint8[out_capacity], n_bytes int32).

    Token ids outside the vocabulary (e.g. special tokens) must be handled by
    the caller; here they are treated as zero-length.
    """
    T = tokens.shape[0]
    V = token_offsets.shape[0] - 1
    tok_valid = (jnp.arange(T) < n_tokens) & (tokens >= 0) & (tokens < V)
    safe_ids = jnp.clip(tokens, 0, V - 1)
    pool_start = jnp.take(token_offsets, safe_ids)           # [T]
    lens = jnp.where(
        tok_valid, jnp.take(token_offsets, safe_ids + 1) - pool_start, 0
    )
    ends = jnp.cumsum(lens)  # int32[T]; ends[t] = first byte pos after token t
    n_bytes = ends[T - 1] if T else jnp.int32(0)
    starts = ends - lens
    # pool index of output byte p from token t is pool_start[t] + (p -
    # starts[t]); fold both per-token terms into ONE value so the per-byte
    # work is exactly two gathers (adj, then the pool byte)
    adj = pool_start - starts                                # [T]

    # source token per output byte: scatter each (len > 0) token's ordinal at
    # its start position, then cummax fills the span
    t_iota = jnp.arange(T, dtype=jnp.int32)
    tgt = jnp.where(tok_valid & (lens > 0), starts, out_capacity)
    marks = jnp.full((out_capacity,), -1, jnp.int32).at[tgt].max(
        t_iota, mode="drop"
    )
    (src_tok,) = pallas_scan.scan_leaves([marks], ["max"])
    src_tok = jnp.clip(src_tok, 0, T - 1)

    pos = jnp.arange(out_capacity, dtype=jnp.int32)
    pool_idx = jnp.take(adj, src_tok) + pos
    pool_idx = jnp.clip(pool_idx, 0, token_bytes.shape[0] - 1)
    out = jnp.where(pos < n_bytes, jnp.take(token_bytes, pool_idx), 0)
    return out, n_bytes
