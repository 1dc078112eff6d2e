"""Device engine: the end-to-end TPU encode pipeline.

Pipeline per batch (documents → token ids), replacing the reference's
sequential per-string loop (``M/GptBytePairEncoding.java:71-103``):

1. Documents are concatenated into one flat byte buffer with one separator
   byte between documents; separators are marked invalid so they classify as
   PAD and act as hard piece breaks (no run, glue, or merge crosses them).
2. DEVICE: vectorized classify + piece-boundary pass (``ops/classify.py``,
   ``ops/boundaries.py``) → piece-start mask.
3. HOST (numpy, O(#pieces) vector ops): piece extraction + length-bucketing
   into padded [rows, lanes] matrices (lanes ∈ {16, 32, ..., 4096}).
4. DEVICE: exact vectorized merge per bucket (``ops/merge.py``) → span ids.
5. HOST: scatter-stitch tokens back into per-document lists (vectorized).

Pieces longer than the largest bucket (40962 bytes of one regex piece —
pathological) fall back to the host oracle for that piece only.

JIT shape discipline: the flat buffer and bucket row counts are padded to
powers of two (with floors), so compilations are cached and reused across
batches.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boundaries, classify, merge
from ..vocab import tables as vtables
from ..vocab.loader import asset_path
from .oracle import OracleEngine, byte_pair_merge

_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
_MIN_FLAT = 8192
_MIN_ROWS = 128
_SEP = 0  # separator byte value (marked invalid; value irrelevant)


def _next_pow2(n: int, floor: int = 1) -> int:
    n = max(n, floor)
    return 1 << (n - 1).bit_length()


class DeviceEngine:
    """JAX/TPU encode engine for one encoding (built-in patterns only)."""

    def __init__(self, name: str, pattern: str, packed: vtables.PackedVocabulary,
                 oracle: OracleEngine):
        self.name = name
        self.pattern = pattern
        self.packed = packed
        self.oracle = oracle
        self._class_table = jnp.asarray(classify.class_table_array())
        self._byte_to_id = jnp.asarray(packed.byte_to_id)
        self._byte_pair_id = jnp.asarray(packed.byte_pair_id)
        self._cuckoo_u = jnp.asarray(packed.cuckoo_u)
        self._cuckoo_v = jnp.asarray(packed.cuckoo_v)
        self._cuckoo_id = jnp.asarray(packed.cuckoo_id)

        @functools.partial(jax.jit, static_argnames=())
        def _boundary_fn(data, valid):
            info = classify.classify_bytes(data, self._class_table, valid)
            return boundaries.piece_starts(info, self.pattern)

        @jax.jit
        def _merge_fn(mat, lens):
            return merge.merge_rows(
                mat, lens, self._byte_to_id, self._byte_pair_id,
                self._cuckoo_u, self._cuckoo_v, self._cuckoo_id,
                self.packed.table_mask,
            )

        self._boundary_fn = _boundary_fn
        self._merge_fn = _merge_fn

    @classmethod
    def from_oracle(cls, oracle: OracleEngine) -> "DeviceEngine":
        packed = vtables.load_packed(
            oracle.name, oracle.ranks,
            _maybe_asset_path(oracle.name),
        )
        return cls(oracle.name, oracle.pattern, packed, oracle)

    # ------------------------------------------------------------------
    # flat buffer construction
    # ------------------------------------------------------------------

    def _flatten(self, texts: Sequence[Optional[str]]):
        """Concatenate docs with separator bytes; returns (buf, valid,
        doc_bounds) where doc_bounds[i] = (start, end) byte range of doc i."""
        encoded = [
            (t.encode("utf-8") if t else b"") for t in texts
        ]
        total = sum(len(e) for e in encoded) + max(0, len(encoded) - 1)
        size = _next_pow2(total, _MIN_FLAT)
        buf = np.zeros(size, dtype=np.uint8)
        valid = np.zeros(size, dtype=bool)
        bounds = []
        pos = 0
        for i, e in enumerate(encoded):
            if i > 0:
                buf[pos] = _SEP  # invalid separator byte
                pos += 1
            start = pos
            if e:
                buf[pos : pos + len(e)] = np.frombuffer(e, dtype=np.uint8)
                valid[pos : pos + len(e)] = True
                pos += len(e)
            bounds.append((start, pos))
        return buf, valid, bounds, pos

    # ------------------------------------------------------------------
    # piece extraction + bucketing (host, vectorized)
    # ------------------------------------------------------------------

    def _pieces(self, buf, valid, bounds, used) -> Tuple[np.ndarray, np.ndarray]:
        """(piece_starts, piece_lens) in flat-buffer coordinates."""
        mask = np.asarray(
            self._boundary_fn(jnp.asarray(buf), jnp.asarray(valid))
        )
        starts = np.flatnonzero(mask[:used])
        if len(starts) == 0:
            return starts.astype(np.int64), starts.astype(np.int64)
        # pieces end at the next piece start or their doc's end (separators
        # are never piece starts, so clamp by doc end)
        doc_ends = np.asarray([e for (_s, e) in bounds], dtype=np.int64)
        next_start = np.append(starts[1:], used)
        doc_of = np.searchsorted(doc_ends, starts, side="right")
        doc_of = np.minimum(doc_of, len(doc_ends) - 1)
        ends = np.minimum(next_start, doc_ends[doc_of])
        return starts.astype(np.int64), (ends - starts).astype(np.int64)

    # ------------------------------------------------------------------
    # merge + stitch
    # ------------------------------------------------------------------

    def _encode_flat(self, buf, starts, lens):
        """Token ids for every piece, stitched into one flat token array plus
        per-piece counts (order = piece order)."""
        n_pieces = len(starts)
        counts = np.zeros(n_pieces, dtype=np.int64)
        piece_tokens: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []

        bucket_of = np.searchsorted(np.asarray(_BUCKETS), lens, side="left")
        oversized = bucket_of >= len(_BUCKETS)

        for b_idx, lanes in enumerate(_BUCKETS):
            sel = np.flatnonzero((bucket_of == b_idx) & ~oversized)
            if len(sel) == 0:
                continue
            R = _next_pow2(len(sel), _MIN_ROWS)
            mat = np.zeros((R, lanes), dtype=np.uint8)
            blens = np.zeros((R,), dtype=np.int32)
            # gather piece bytes: rows x lanes fancy index into flat buffer
            gidx = starts[sel][:, None] + np.arange(lanes)[None, :]
            np.minimum(gidx, len(buf) - 1, out=gidx)
            rows = buf[gidx]
            lane_mask = np.arange(lanes)[None, :] < lens[sel][:, None]
            mat[: len(sel)] = np.where(lane_mask, rows, 0)
            blens[: len(sel)] = lens[sel]

            ids, active = self._merge_fn(jnp.asarray(mat), jnp.asarray(blens))
            ids = np.asarray(ids)[: len(sel)]
            active = np.asarray(active)[: len(sel)]
            counts[sel] = active.sum(axis=1)
            piece_tokens.append((sel, ids, active))

        # host-oracle fallback for pathological pieces (> max bucket)
        over_sel = np.flatnonzero(oversized)
        over_tokens = {}
        for pi in over_sel:
            pc = bytes(buf[starts[pi] : starts[pi] + lens[pi]])
            rank = self.oracle.ranks.get(pc)
            toks = [rank] if rank is not None else byte_pair_merge(pc, self.oracle.ranks)
            over_tokens[pi] = toks
            counts[pi] = len(toks)

        # stitch: output offsets per piece, scatter each bucket's tokens
        offsets = np.zeros(n_pieces + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        out = np.zeros(int(offsets[-1]), dtype=np.int64)
        for sel, ids, active in piece_tokens:
            pos_in_row = np.cumsum(active, axis=1) - 1
            tgt = offsets[sel][:, None] + pos_in_row
            out[tgt[active]] = ids[active]
        for pi, toks in over_tokens.items():
            out[offsets[pi] : offsets[pi] + len(toks)] = toks
        return out, offsets

    # ------------------------------------------------------------------
    # public batch API
    # ------------------------------------------------------------------

    def encode_ordinary_batch(
        self, texts: Sequence[Optional[str]]
    ) -> List[List[int]]:
        if not texts:
            return []
        buf, valid, bounds, used = self._flatten(texts)
        starts, lens = self._pieces(buf, valid, bounds, used)
        flat, offsets = self._encode_flat(buf, starts, lens)
        # split tokens per document: pieces are in document order
        doc_ends = np.asarray([e for (_s, e) in bounds], dtype=np.int64)
        doc_of = np.minimum(
            np.searchsorted(doc_ends, starts, side="right"), len(doc_ends) - 1
        )
        out: List[List[int]] = []
        for d in range(len(texts)):
            sel = np.flatnonzero(doc_of == d)
            if len(sel) == 0:
                out.append([])
            else:
                lo = offsets[sel[0]]
                hi = offsets[sel[-1] + 1]
                out.append(flat[lo:hi].tolist())
        return out

    def count_tokens_batch(self, texts: Sequence[Optional[str]]) -> List[int]:
        return [len(t) for t in self.encode_ordinary_batch(texts)]


def _maybe_asset_path(name: str):
    try:
        return asset_path(name)
    except Exception:
        return None
