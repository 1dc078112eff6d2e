"""Data-parallel sharded encode over a device mesh (stage-A v4 pipeline).

Layout (per BASELINE.json north star): corpus shards are data-parallel over
a 1-D mesh; the packed vocab tables (byte→id, word table, cuckoo pair rows)
are replicated per chip; the global token count reduces with ``psum`` over
ICI/DCN.

Every compute stage runs under ``jax.shard_map``: each device executes the
SAME single-chip v4 pipeline (classify → fused-scan boundaries → word-table
direct hits → bucketed transposed merges → offset/scatter stage C,
``ops/stage4.py`` + ``ops/pipeline.py``) on its own [S]-byte shard — XLA
partitions dim 0 with zero communication; the only collective is the count
psum. Host syncs mirror the single-chip engine: one [D, META] fetch after
stage A, one packed token fetch at the end.

The reference's only parallelism is a JVM thread pool fanning files out
(``benchmark/.../AbstractMultiThreadedBenchmark.java:35-45``); this is the
TPU-native replacement.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.device import DeviceEngine, _next_pow2
from ..ops import pipeline, stage4
from .mesh import DATA_AXIS, data_mesh

_DIVS = (4, 8)        # piece/miss capacity divisors (unicode-primary sizing)
_DIVS_ROOMY = (1, 2)  # sufficient for any input; used on capacity retry


def _spec_like(x):
    return P(DATA_AXIS, *([None] * (x.ndim - 1)))


class ShardedTokenizer:
    """Multi-chip data-parallel tokenizer for one encoding."""

    def __init__(self, engine: DeviceEngine, mesh: Optional[Mesh] = None):
        self.engine = engine
        self.mesh = mesh if mesh is not None else data_mesh()
        self.n_dev = self.mesh.devices.size
        eng = engine

        # ---- stage A: one shard_map'd jit per (divs) variant -------------
        self._stage_a_jits = {}

        def _stage_a(divs: Tuple[int, int]):
            fn = self._stage_a_jits.get(divs)
            if fn is None:
                def per_shard(buf, doc_ends):
                    t, meta = stage4.stage_a_v4(
                        buf[0], doc_ends[0], eng._class_table, eng.pattern,
                        eng._word_rows0, eng._word_rows1,
                        eng.packed.word_mask,
                        variant="unicode", piece_div=divs[0],
                        miss_div=divs[1],
                    )
                    out = (t.starts, t.lens, t.hit, t.miss_sorted,
                           t.group_start, t.bucket_counts, meta)
                    return tuple(x[None] for x in out)

                def wrapped(buf, doc_ends):
                    out_specs = tuple([P(DATA_AXIS, None)] * 7)
                    return jax.shard_map(
                        per_shard, mesh=self.mesh,
                        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
                        out_specs=out_specs,
                    )(buf, doc_ends)

                fn = jax.jit(wrapped)
                self._stage_a_jits[divs] = fn
            return fn

        self._stage_a = _stage_a

        # ---- merges + stage C: jit per (bucket signature, want) ----------
        self._merge_jits = {}

        def _merge_all(sig, want: str, N: int, D: int):
            """sig = tuple of (bucket_index, lanes, cap) for nonempty
            buckets; want = "tokens" | "counts" | "total"."""
            key = (sig, want, N, D)
            fn = self._merge_jits.get(key)
            if fn is None:
                def per_shard(buf, starts, lens, hit, miss_sorted,
                              group_start, bucket_counts, doc_ends):
                    (buf, starts, lens, hit, miss_sorted, group_start,
                     bucket_counts, doc_ends) = (
                        buf[0], starts[0], lens[0], hit[0], miss_sorted[0],
                        group_start[0], bucket_counts[0], doc_ends[0])
                    # pieces are valid while starts < N (masked_positions
                    # pads the starts table with N)
                    n_pieces = jnp.sum(
                        (starts < buf.shape[0]).astype(jnp.int32)
                    )
                    counts = pipeline.counts_init(hit, n_pieces)
                    outs = []
                    for (b, lanes, cap) in sig:
                        cols, ids, active = pipeline.merge_bucket_v2(
                            buf, starts, lens, miss_sorted, group_start[b],
                            bucket_counts[b], eng._byte_to_id,
                            eng._byte_pair_id, eng._pair_rows0,
                            eng._pair_rows1, eng.packed.table_mask,
                            lanes=lanes, cap=cap,
                        )
                        counts = pipeline.counts_add_bucket(
                            counts, cols, active
                        )
                        outs.append((cols, ids, active))
                    offsets, n_tokens = pipeline.make_offsets(
                        counts, n_pieces
                    )
                    doc_counts = stage4.doc_token_counts_v4(
                        offsets, n_tokens, starts, doc_ends, n_pieces
                    )
                    if want == "total":
                        # the one cross-chip collective: global token count
                        total = jax.lax.psum(n_tokens, DATA_AXIS)
                        return (total[None],)
                    if want == "counts":
                        return n_tokens[None], doc_counts[None]
                    tokens = pipeline.scatter_hits(
                        buf.shape[0], hit, offsets, n_pieces
                    )
                    for cols, ids, active in outs:
                        tokens = pipeline.scatter_bucket(
                            tokens, ids, active, cols, offsets
                        )
                    return (tokens[None], n_tokens[None], doc_counts[None])

                n_out = {"total": 1, "counts": 2, "tokens": 3}[want]
                if want == "total":
                    out_specs = (P(DATA_AXIS),)
                else:
                    out_specs = tuple(
                        [P(DATA_AXIS, None)] * (n_out - 2)
                        + [P(DATA_AXIS), P(DATA_AXIS, None)]
                    )

                def wrapped(*args):
                    return jax.shard_map(
                        per_shard, mesh=self.mesh,
                        in_specs=tuple(_spec_like(a) for a in args),
                        out_specs=out_specs,
                    )(*args)

                fn = jax.jit(wrapped)
                self._merge_jits[key] = fn
            return fn

        self._merge_all = _merge_all

    # ------------------------------------------------------------------

    def _shard_docs(self, texts: Sequence[Optional[str]]):
        """Greedy byte-balanced assignment of whole docs to devices, then
        per-device flattening with separator bytes (docs never straddle
        shards). Returns (bufs [D,S], doc_ends [D,Dm], assign)."""
        encoded = [(t.encode("utf-8") if t else b"") for t in texts]
        order = sorted(range(len(encoded)), key=lambda i: -len(encoded[i]))
        loads = [0] * self.n_dev
        assign: List[List[int]] = [[] for _ in range(self.n_dev)]
        for i in order:
            d = loads.index(min(loads))
            assign[d].append(i)
            loads[d] += len(encoded[i]) + 1
        for a in assign:
            a.sort()  # restore document order within each shard

        S = _next_pow2(max(max(loads), 1), 8192)
        Dm = _next_pow2(max(max(len(a) for a in assign), 1), 8)
        bufs = np.zeros((self.n_dev, S), dtype=np.uint8)
        doc_ends = np.zeros((self.n_dev, Dm), dtype=np.int32)
        for d, docs in enumerate(assign):
            pos = 0
            ends = []
            for k, i in enumerate(docs):
                if k > 0:
                    pos += 1  # separator byte (derived invalid on device)
                e = encoded[i]
                if e:
                    bufs[d, pos : pos + len(e)] = np.frombuffer(e, np.uint8)
                    pos += len(e)
                ends.append(pos)
            doc_ends[d, : len(ends)] = ends
            doc_ends[d, len(ends):] = pos  # pad with used length
        return bufs, doc_ends, assign

    def _put_sharded(self, arr: np.ndarray):
        sh = NamedSharding(self.mesh, _spec_like(arr))
        return jax.device_put(arr, sh)

    @staticmethod
    def _fetch(arr) -> np.ndarray:
        """Global host value of a dim-0-sharded array; on a multi-process
        mesh the non-addressable shards ride an allgather."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(arr, tiled=True)
            )
        return np.asarray(arr)

    def _run_stage_a(self, bufs, doc_ends):
        """Stage A with capacity retry. Returns (tables tuple, metas np)."""
        bufs_d = self._put_sharded(bufs)
        ends_d = self._put_sharded(doc_ends)
        out = self._stage_a(_DIVS)(bufs_d, ends_d)
        metas = self._fetch(out[-1])
        if (metas[:, 0] & stage4.OVERFLOW_CAPACITY).any():
            out = self._stage_a(_DIVS_ROOMY)(bufs_d, ends_d)
            metas = self._fetch(out[-1])
        return bufs_d, ends_d, out[:-1], metas

    def _bucket_sig(self, metas, N: int):
        sig = []
        for b, lanes in enumerate(stage4.BUCKET_WIDTHS):
            cnt = int(metas[:, 2 + b].max(initial=0))
            if cnt == 0:
                continue
            cap = min(
                _next_pow2(cnt, self.engine._CAP_FLOOR),
                _next_pow2(max(N // self.engine._BUCKET_MAX_DIV[lanes], 8)),
            )
            sig.append((b, lanes, cap))
        return tuple(sig)

    def _oracle_fallback(self, texts):
        return [self.engine.oracle.encode_ordinary(t)[0] for t in texts]

    # ------------------------------------------------------------------

    def count_tokens_corpus(self, texts: Sequence[Optional[str]]) -> int:
        """Total token count, data-parallel with ONE psum'd scalar fetch."""
        if not texts:
            return 0
        bufs, doc_ends, _assign = self._shard_docs(texts)
        bufs_d, ends_d, tables, metas = self._run_stage_a(bufs, doc_ends)
        if (metas[:, 0] & stage4.OVERFLOW_PIECE_LEN).any():
            return sum(len(t) for t in self._oracle_fallback(texts))
        sig = self._bucket_sig(metas, bufs.shape[1])
        (total,) = self._merge_all(
            sig, "total", bufs.shape[1], self.n_dev
        )(bufs_d, *tables, ends_d)
        return int(self._fetch(total)[0])

    def encode_ordinary_batch_arrays(
        self, texts: Sequence[Optional[str]]
    ) -> List[np.ndarray]:
        """Sharded batch encode; int32 array per document, identical to the
        host oracle's tokens."""
        empty = np.zeros((0,), np.int32)
        if not texts:
            return []
        bufs, doc_ends, assign = self._shard_docs(texts)
        bufs_d, ends_d, tables, metas = self._run_stage_a(bufs, doc_ends)
        if (metas[:, 0] & stage4.OVERFLOW_PIECE_LEN).any():
            return [
                np.asarray(t, dtype=np.int32)
                for t in self._oracle_fallback(texts)
            ]
        sig = self._bucket_sig(metas, bufs.shape[1])
        tokens, n_tokens, doc_counts = self._merge_all(
            sig, "tokens", bufs.shape[1], self.n_dev
        )(bufs_d, *tables, ends_d)
        # one packed fetch: all shards' token prefixes up to the max live
        # count (quantized), then the small metas
        n_tok = self._fetch(n_tokens)
        dc = self._fetch(doc_counts)
        out: List[np.ndarray] = [empty] * len(texts)
        pad = min(_next_pow2(int(n_tok.max(initial=1)), 8192),
                  tokens.shape[1])
        sliced = tokens[:, :pad]
        if jax.process_count() == 1:
            sliced.copy_to_host_async()
        toks = self._fetch(sliced)
        for d, docs in enumerate(assign):
            if not docs:
                continue
            shard_toks = toks[d, : n_tok[d]]
            splits = np.cumsum(dc[d, : len(docs)])[:-1]
            for doc_idx, t in zip(docs, np.split(shard_toks, splits)):
                out[doc_idx] = t
        return out

    def encode_ordinary_batch(
        self, texts: Sequence[Optional[str]]
    ) -> List[List[int]]:
        return [
            a.tolist() for a in self.encode_ordinary_batch_arrays(texts)
        ]
