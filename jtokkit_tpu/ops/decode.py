"""Device decode: token ids → UTF-8 bytes as a gather over the packed
token-byte pool (reference decode walks a reverse HashMap per token,
``M/GptBytePairEncoding.java:137-151``; here every output byte is produced
in parallel).

For each output byte position p: find its source token via searchsorted over
the running byte offsets, then gather the byte from the pool at
``token_offset[id] + (p - start_of_token)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    lens = jnp.where(
        tok_valid,
        token_offsets[safe_ids + 1] - token_offsets[safe_ids],
        0,
    )
    ends = jnp.cumsum(lens)  # int32[T]; ends[t] = first byte pos after token t
    n_bytes = ends[T - 1] if T else jnp.int32(0)

    pos = jnp.arange(out_capacity, dtype=jnp.int32)
    src_tok = jnp.searchsorted(ends, pos, side="right").astype(jnp.int32)
    src_tok = jnp.minimum(src_tok, T - 1)
    tok_start = ends[src_tok] - lens[src_tok]
    within = pos - tok_start
    pool_idx = token_offsets[safe_ids[src_tok]] + within
    pool_idx = jnp.clip(pool_idx, 0, token_bytes.shape[0] - 1)
    out = jnp.where(pos < n_bytes, token_bytes[pool_idx], 0)
    return out, n_bytes
