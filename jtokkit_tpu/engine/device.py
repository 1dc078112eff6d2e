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
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boundaries, classify, decode as decode_ops, merge, pipeline
from ..vocab import tables as vtables
from ..vocab.loader import asset_path
from .oracle import OracleEngine, byte_pair_merge

_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
_MIN_FLAT = 8192
_MIN_ROWS = 128
_SEP = 0  # separator byte value (marked invalid; value irrelevant)
# Max flat-buffer size per device call; overridable (tests use small chunks
# to keep compile times down on the CPU backend).
_CHUNK_BYTES = int(os.environ.get("JTOKKIT_TPU_CHUNK", 1 << 20))
# Quantized chunk shapes: each distinct (flat size, doc slots) pair costs a
# compilation (slow through the remote-compile tunnel), so allow only a few.
_FLAT_SIZES = tuple(
    s for s in (8192, 131072, 1 << 21) if s < _CHUNK_BYTES
) + (_CHUNK_BYTES,)
_DOC_SIZES = (64, 1024, 16384, 262144)


def _quantize(n: int, sizes) -> int:
    for s in sizes:
        if n <= s:
            return s
    # beyond the largest quantized size (e.g. one giant unsplittable doc):
    # fall back to an exact power of two, accepting a one-off compilation
    return _next_pow2(n)


def enable_compile_cache():
    """Persist XLA compilations next to the package (compiles through the
    remote-compile tunnel are expensive; the cache makes them one-time)."""
    try:
        cache_dir = os.path.join(os.path.dirname(__file__), "..", "_xla_cache")
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


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

        enable_compile_cache()

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

        self._word_w0 = jnp.asarray(packed.word_w0)
        self._word_w1 = jnp.asarray(packed.word_w1)
        word_lenid = np.where(
            packed.word_len < 0, -1, (packed.word_len << 20) | packed.word_id
        ).astype(np.int32)
        self._word_lenid = jnp.asarray(word_lenid)

        @jax.jit
        def _stage_a_fn(buf, valid, doc_ends):
            return pipeline.stage_a(
                buf, valid, doc_ends, self._class_table, self.pattern,
                self._word_w0, self._word_w1, self._word_lenid,
                self.packed.word_mask,
            )

        self._merge_bucket_jits = {}

        def _merge_bucket_fn(lanes: int, cap: int):
            key = (lanes, cap)
            fn = self._merge_bucket_jits.get(key)
            if fn is None:
                fn = jax.jit(
                    functools.partial(
                        pipeline.merge_bucket,
                        lanes=lanes, cap=cap,
                    ),
                    static_argnames=(),
                )
                self._merge_bucket_jits[key] = fn
            return fn

        self._counts_init = jax.jit(pipeline.counts_init)
        self._counts_add = jax.jit(pipeline.counts_add_bucket)
        self._make_offsets = jax.jit(pipeline.make_offsets)
        self._scatter_hits = jax.jit(pipeline.scatter_hits, static_argnums=(0,))
        self._scatter_bucket = jax.jit(pipeline.scatter_bucket)
        self._doc_counts = jax.jit(
            pipeline.doc_token_counts, static_argnums=(3,)
        )
        self._stage_a_fn = _stage_a_fn
        self._merge_bucket_fn = _merge_bucket_fn

        self._token_offsets = jnp.asarray(packed.token_offsets)
        self._token_bytes = jnp.asarray(packed.token_bytes)

        @functools.partial(jax.jit, static_argnames=("out_capacity",))
        def _decode_fn(tokens, n_tokens, out_capacity):
            return decode_ops.decode_tokens(
                tokens, n_tokens, self._token_offsets, self._token_bytes,
                out_capacity,
            )

        self._boundary_fn = _boundary_fn
        self._merge_fn = _merge_fn
        self._decode_fn = _decode_fn

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
    # chunk planning (single-jit pipeline path)
    # ------------------------------------------------------------------

    @staticmethod
    def _safe_split(data: bytes, limit: int) -> int:
        """Largest split point ≤ limit that is provably a piece boundary for
        both patterns: previous byte is an ASCII letter/digit and the byte at
        the split is CR/LF (a completed alnum run on the left; CR/LF on the
        right can neither glue backward nor be absorbed by an alnum piece).
        Returns 0 if no safe point exists."""
        w = np.frombuffer(data[:limit], dtype=np.uint8)
        if len(w) < 2:
            return 0
        is_crlf = (w[1:] == 0x0A) | (w[1:] == 0x0D)
        prev = w[:-1]
        is_alnum = (
            ((prev >= 0x30) & (prev <= 0x39))
            | ((prev >= 0x41) & (prev <= 0x5A))
            | ((prev >= 0x61) & (prev <= 0x7A))
        )
        cand = np.flatnonzero(is_crlf & is_alnum)
        return int(cand[-1]) + 1 if len(cand) else 0

    def _plan_chunks(self, texts: Sequence[Optional[str]]):
        """Split the batch into device chunks.

        Yields (buf, valid, doc_ends, parts) where parts[i] = original doc
        index of chunk-document i (one doc may span several chunk-documents
        across chunks, in order; their tokens concatenate).
        """
        pending = []  # (doc_idx, bytes)
        for i, t in enumerate(texts):
            data = t.encode("utf-8") if t else b""
            while len(data) > _CHUNK_BYTES - 1:
                p = self._safe_split(data, _CHUNK_BYTES - 1)
                if p == 0:
                    break  # no safe point: single giant piece-dense doc
                pending.append((i, data[:p]))
                data = data[p:]
            pending.append((i, data))

        chunk: List = []
        size = 0
        for item in pending:
            extra = len(item[1]) + (1 if chunk else 0)
            if chunk and size + extra > _CHUNK_BYTES:
                yield self._build_chunk(chunk)
                chunk, size = [], 0
            chunk.append(item)
            size += len(item[1]) + 1
        if chunk:
            yield self._build_chunk(chunk)

    @staticmethod
    def _build_chunk(items):
        total = sum(len(d) for (_i, d) in items) + len(items) - 1
        size = _quantize(total, _FLAT_SIZES)
        buf = np.zeros(size, dtype=np.uint8)
        valid = np.zeros(size, dtype=bool)
        ends = np.zeros(len(items), dtype=np.int32)
        parts = []
        pos = 0
        for k, (i, data) in enumerate(items):
            if k > 0:
                pos += 1  # separator (invalid byte)
            if data:
                buf[pos : pos + len(data)] = np.frombuffer(data, np.uint8)
                valid[pos : pos + len(data)] = True
                pos += len(data)
            ends[k] = pos
            parts.append(i)
        d_size = _quantize(len(items), _DOC_SIZES)
        doc_ends = np.full(d_size, pos, dtype=np.int32)
        doc_ends[: len(items)] = ends
        return buf, valid, doc_ends, parts

    # ------------------------------------------------------------------
    # public batch API
    # ------------------------------------------------------------------

    # capacity variants per bucket: smallest power of two ≥ count, floored,
    # clamped to the guaranteed maximum for the chunk size
    _CAP_FLOOR = 512

    def _bucket_cap(self, n_chunk: int, lanes: int, count: int) -> int:
        max_cap = max(n_chunk // pipeline.BUCKET_MAX_DIV[lanes], 8)
        return min(_next_pow2(count, self._CAP_FLOOR), _next_pow2(max_cap))

    def _process_chunks(self, texts, want_tokens: bool):
        """Run the staged pipeline over all chunks with two host sync
        rounds: one for stage-A metadata, one for final outputs."""
        plan = list(self._plan_chunks(texts))
        staged = []
        for buf, valid, doc_ends, parts in plan:
            table, meta = self._stage_a_fn(
                jnp.asarray(buf), jnp.asarray(valid), jnp.asarray(doc_ends)
            )
            staged.append((buf, valid, doc_ends, parts, table, meta))

        results = []
        for buf, valid, doc_ends, parts, t, meta in staged:
            meta_np = np.asarray(meta)  # sync round 1 (tiny)
            overflow, n_pieces = int(meta_np[0]), int(meta_np[1])
            bucket_counts = meta_np[2:]
            if overflow > 0:
                results.append(("fallback", buf, valid, doc_ends, parts))
                continue
            N = len(buf)
            counts = self._counts_init(t.hit, t.n_pieces)
            bucket_outs = []
            for b, lanes in enumerate(pipeline.BUCKET_WIDTHS):
                cnt = int(bucket_counts[b])
                if cnt == 0:
                    continue
                cap = self._bucket_cap(N, lanes, cnt)
                cols, ids, active = self._merge_bucket_fn(lanes, cap)(
                    jnp.asarray(buf), t.starts, t.lens, t.miss_sorted,
                    t.group_start[b], jnp.int32(cnt),
                    self._byte_to_id, self._byte_pair_id, self._cuckoo_u,
                    self._cuckoo_v, self._cuckoo_id, self.packed.table_mask,
                )
                counts = self._counts_add(counts, cols, active)
                bucket_outs.append((cols, ids, active))
            offsets, n_tokens = self._make_offsets(counts, t.n_pieces)
            if want_tokens:
                tokens = self._scatter_hits(N, t.hit, offsets, t.n_pieces)
                for cols, ids, active in bucket_outs:
                    tokens = self._scatter_bucket(
                        tokens, ids, active, cols, offsets
                    )
            else:
                tokens = None
            doc_counts = self._doc_counts(
                counts, t.doc_of, t.n_pieces, len(doc_ends)
            )
            results.append(
                ("ok", parts, tokens, n_tokens, doc_counts)
            )
        return results

    def encode_ordinary_batch(
        self, texts: Sequence[Optional[str]]
    ) -> List[List[int]]:
        if not texts:
            return []
        out: List[List[int]] = [[] for _ in texts]
        for res in self._process_chunks(texts, want_tokens=True):
            if res[0] == "fallback":
                _, buf, valid, doc_ends, parts = res
                self._encode_chunk_fallback(buf, valid, doc_ends, parts, out)
                continue
            _, parts, tokens_dev, n_tokens_dev, doc_counts_dev = res
            n_tokens = int(n_tokens_dev)  # sync round 2
            tokens = np.asarray(
                tokens_dev[:n_tokens] if n_tokens else tokens_dev[:0]
            )
            doc_counts = np.asarray(doc_counts_dev)[: len(parts)]
            splits = np.cumsum(doc_counts)[:-1]
            for doc_idx, toks in zip(parts, np.split(tokens, splits)):
                out[doc_idx].extend(toks.tolist())
        return out

    def count_tokens_batch(self, texts: Sequence[Optional[str]]) -> List[int]:
        if not texts:
            return []
        counts = [0] * len(texts)
        for res in self._process_chunks(texts, want_tokens=False):
            if res[0] == "fallback":
                _, buf, valid, doc_ends, parts = res
                tmp: List[List[int]] = [[] for _ in texts]
                self._encode_chunk_fallback(buf, valid, doc_ends, parts, tmp)
                for i, toks in enumerate(tmp):
                    counts[i] += len(toks)
                continue
            _, parts, _tokens, _n_tokens, doc_counts_dev = res
            doc_counts = np.asarray(doc_counts_dev)[: len(parts)]
            for doc_idx, c in zip(parts, doc_counts):
                counts[doc_idx] += int(c)
        return counts

    def count_tokens_corpus(self, texts: Sequence[Optional[str]]) -> int:
        """Total token count; only small arrays leave the device."""
        total = 0
        for res in self._process_chunks(texts, want_tokens=False):
            if res[0] == "fallback":
                _, buf, valid, doc_ends, parts = res
                tmp: List[List[int]] = [[] for _ in texts]
                self._encode_chunk_fallback(buf, valid, doc_ends, parts, tmp)
                total += sum(len(t) for t in tmp)
                continue
            total += int(res[3])
        return total

    def decode_bytes_batch(self, token_lists) -> List[bytes]:
        """Device-gathered decode for batches of plain vocab ids.

        Lists containing special-token or out-of-vocab ids fall back to the
        host oracle per list (preserving its error/special semantics).
        """
        out: List[Optional[bytes]] = [None] * len(token_lists)
        flat: List[int] = []
        splits: List[Tuple[int, int, int]] = []  # (list_idx, lo, hi)
        for i, toks in enumerate(token_lists):
            arr = np.asarray(list(toks), dtype=np.int64)
            if len(arr) and (
                arr.min() < 0 or arr.max() >= self.packed.n_tokens
            ):
                out[i] = self.oracle.decode_bytes(arr.tolist())
            else:
                splits.append((i, len(flat), len(flat) + len(arr)))
                flat.extend(arr.tolist())
        if flat:
            T = _next_pow2(len(flat), 1024)
            tokens = np.full(T, -1, dtype=np.int32)
            tokens[: len(flat)] = flat
            cap = T * 8
            data, n_bytes = self._decode_fn(
                jnp.asarray(tokens), len(flat), cap
            )
            if int(n_bytes) > cap:  # rare: very long average tokens
                cap = T * self.packed.max_token_len
                data, n_bytes = self._decode_fn(
                    jnp.asarray(tokens), len(flat), cap
                )
            data = np.asarray(data[: int(n_bytes)]).tobytes()
            # per-list byte offsets from token lengths
            lens = self.packed.token_lengths[np.asarray(flat, dtype=np.int64)]
            byte_ends = np.cumsum(lens)
            for i, lo, hi in splits:
                blo = 0 if lo == 0 else int(byte_ends[lo - 1])
                bhi = 0 if hi == 0 else int(byte_ends[hi - 1])
                out[i] = data[blo:bhi]
        return [b if b is not None else b"" for b in out]

    def _encode_chunk_fallback(self, buf, valid, doc_ends, parts, out) -> None:
        """Host-glue path (boundaries on device, packing on host) for chunks
        containing pieces larger than the pipeline's biggest bucket."""
        used = int(doc_ends[len(parts) - 1])
        bounds = []
        prev = 0
        for k in range(len(parts)):
            end = int(doc_ends[k])
            start = prev if k == 0 else prev + 1
            bounds.append((start, end))
            prev = end
        starts, lens = self._pieces(buf, valid, bounds, used)
        flat, offsets = self._encode_flat(buf, starts, lens)
        ends_arr = np.asarray([e for (_s, e) in bounds], dtype=np.int64)
        doc_of = np.minimum(
            np.searchsorted(ends_arr, starts, side="right"), len(ends_arr) - 1
        )
        for d, doc_idx in enumerate(parts):
            sel = np.flatnonzero(doc_of == d)
            if len(sel):
                lo, hi = offsets[sel[0]], offsets[sel[-1] + 1]
                out[doc_idx].extend(flat[lo:hi].tolist())


def _maybe_asset_path(name: str):
    try:
        return asset_path(name)
    except Exception:
        return None
