"""Data-parallel sharded encode over a device mesh.

Layout (per BASELINE.json north star): corpus shards are data-parallel over a
1-D mesh; the packed vocab tables (byte→id, byte-pair seed, cuckoo pair
tables) are replicated per chip; global token/byte counts reduce with
``psum`` over ICI/DCN.

Two sharded stages (both row/shard independent, so XLA partitions them with
zero communication; the only collective is the final count psum):

  1. boundary pass over per-device byte buffers  [D, S]   (sharded dim 0)
  2. merge over bucketed piece matrices          [R, L]   (rows sharded)

Host glue (piece packing between the stages) is identical to the single-chip
engine.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.device import DeviceEngine, _BUCKETS, _next_pow2
from ..ops import merge as merge_ops
from .mesh import DATA_AXIS, data_mesh


class ShardedTokenizer:
    """Multi-chip data-parallel tokenizer for one encoding."""

    def __init__(self, engine: DeviceEngine, mesh: Optional[Mesh] = None):
        self.engine = engine
        self.mesh = mesh if mesh is not None else data_mesh()
        self.n_dev = self.mesh.devices.size

        shard2 = NamedSharding(self.mesh, P(DATA_AXIS, None))
        shard1 = NamedSharding(self.mesh, P(DATA_AXIS))
        repl = NamedSharding(self.mesh, P())

        eng = engine

        @partial(
            jax.jit,
            in_shardings=(shard2, shard2),
            out_shardings=shard2,
        )
        def _boundaries_dp(bufs, valids):
            return jax.vmap(lambda b, v: eng._boundary_fn(b, v))(bufs, valids)

        @partial(
            jax.jit,
            in_shardings=(shard2, shard1),
            out_shardings=(shard2, shard2),
        )
        def _merge_dp(mat, lens):
            return merge_ops.merge_rows(
                mat, lens, eng._byte_to_id, eng._byte_pair_id,
                eng._cuckoo_u, eng._cuckoo_v, eng._cuckoo_id,
                eng.packed.table_mask,
            )

        @partial(
            jax.jit,
            in_shardings=(shard2, shard1),
            out_shardings=repl,
        )
        def _merge_count_dp(mat, lens):
            _ids, active = merge_ops.merge_rows(
                mat, lens, eng._byte_to_id, eng._byte_pair_id,
                eng._cuckoo_u, eng._cuckoo_v, eng._cuckoo_id,
                eng.packed.table_mask,
            )
            # global token count: XLA inserts the cross-chip reduction.
            # int32 is safe per call: counts are bounded by chunk bytes;
            # the host accumulates across chunks in a Python int.
            return jnp.sum(active.astype(jnp.int32))

        self._boundaries_dp = _boundaries_dp
        self._merge_dp = _merge_dp
        self._merge_count_dp = _merge_count_dp

    # ------------------------------------------------------------------

    def _shard_docs(self, texts: Sequence[Optional[str]]):
        """Greedy byte-balanced assignment of whole docs to devices, then
        per-device flattening (docs never straddle shards)."""
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

        S = _next_pow2(max(loads) if loads else 1, 8192)
        bufs = np.zeros((self.n_dev, S), dtype=np.uint8)
        valids = np.zeros((self.n_dev, S), dtype=bool)
        bounds: List[List[Tuple[int, int, int]]] = [[] for _ in range(self.n_dev)]
        for d, docs in enumerate(assign):
            pos = 0
            for k, i in enumerate(docs):
                if k > 0:
                    pos += 1  # separator byte (invalid)
                e = encoded[i]
                if e:
                    bufs[d, pos : pos + len(e)] = np.frombuffer(e, np.uint8)
                    valids[d, pos : pos + len(e)] = True
                bounds[d].append((i, pos, pos + len(e)))
                pos += len(e)
        return bufs, valids, bounds

    def _pack_pieces(self, bufs, valids, bounds):
        """Host packing: per-shard piece extraction → one global bucket set.

        Returns per bucket: (mat, lens, piece_doc, piece_order) with rows
        padded to a multiple of the mesh size.
        """
        masks = np.asarray(self._boundaries_dp(jnp.asarray(bufs), jnp.asarray(valids)))
        pieces = []  # (shard, start, length, doc)
        for d in range(self.n_dev):
            if not bounds[d]:
                continue
            doc_ends = np.asarray([e for (_i, _s, e) in bounds[d]], dtype=np.int64)
            doc_ids = np.asarray([i for (i, _s, _e) in bounds[d]], dtype=np.int64)
            used = int(doc_ends[-1])
            starts = np.flatnonzero(masks[d, :used])
            if len(starts) == 0:
                continue
            nxt = np.append(starts[1:], used)
            which = np.minimum(
                np.searchsorted(doc_ends, starts, side="right"), len(doc_ends) - 1
            )
            ends = np.minimum(nxt, doc_ends[which])
            pieces.append(
                (
                    np.full(len(starts), d),
                    starts,
                    ends - starts,
                    doc_ids[which],
                )
            )
        if not pieces:
            return []
        shard = np.concatenate([p[0] for p in pieces])
        start = np.concatenate([p[1] for p in pieces])
        plen = np.concatenate([p[2] for p in pieces])
        pdoc = np.concatenate([p[3] for p in pieces])
        # global piece order: (doc, position) so stitching is a stable sort
        order = np.lexsort((start, pdoc))
        shard, start, plen, pdoc = (
            shard[order], start[order], plen[order], pdoc[order]
        )

        out = []
        bucket_of = np.searchsorted(np.asarray(_BUCKETS), plen, side="left")
        for b_idx, lanes in enumerate(_BUCKETS):
            sel = np.flatnonzero(bucket_of == b_idx)
            if len(sel) == 0:
                continue
            R = max(_next_pow2(len(sel), 128), self.n_dev)
            mat = np.zeros((R, lanes), dtype=np.uint8)
            lens_arr = np.zeros((R,), dtype=np.int32)
            gidx = start[sel][:, None] + np.arange(lanes)[None, :]
            np.minimum(gidx, bufs.shape[1] - 1, out=gidx)
            rows = bufs[shard[sel][:, None], gidx]
            lane_mask = np.arange(lanes)[None, :] < plen[sel][:, None]
            mat[: len(sel)] = np.where(lane_mask, rows, 0)
            lens_arr[: len(sel)] = plen[sel]
            out.append((mat, lens_arr, sel, pdoc))
        return out

    # ------------------------------------------------------------------

    def count_tokens_corpus(self, texts: Sequence[Optional[str]]) -> int:
        """Total token count of a corpus, merged data-parallel across the
        mesh with a psum'd global count (one scalar leaves the device)."""
        if not texts:
            return 0
        bufs, valids, bounds = self._shard_docs(texts)
        total = 0
        for mat, lens, _sel, _pdoc in self._pack_pieces(bufs, valids, bounds):
            total += int(self._merge_count_dp(jnp.asarray(mat), jnp.asarray(lens)))
        return total

    def encode_ordinary_batch(
        self, texts: Sequence[Optional[str]]
    ) -> List[List[int]]:
        """Sharded batch encode; output identical to the host oracle."""
        if not texts:
            return []
        bufs, valids, bounds = self._shard_docs(texts)
        packed = self._pack_pieces(bufs, valids, bounds)
        doc_tokens: List[List[int]] = [[] for _ in texts]
        results = []
        for mat, lens, sel, pdoc in packed:
            ids, active = self._merge_dp(jnp.asarray(mat), jnp.asarray(lens))
            results.append((np.asarray(ids), np.asarray(active), sel, pdoc))
        # stitch: pieces were globally ordered (doc, position); collect per
        # piece index then append in order
        if not results:
            return doc_tokens
        n_pieces = max(int(sel.max()) + 1 for (_i, _a, sel, _d) in results)
        per_piece: List[Optional[np.ndarray]] = [None] * n_pieces
        pdoc_all = results[0][3]
        for ids, active, sel, _ in results:
            for row, p in enumerate(sel):
                per_piece[p] = ids[row][active[row]]
        for p in range(n_pieces):
            toks = per_piece[p]
            if toks is not None:
                doc_tokens[int(pdoc_all[p])].extend(toks.tolist())
        return doc_tokens
