"""Host simulation of the exact safe-batched merge (docs/perf-notes.md lever 1).

Validates, before any device work:
  1. exactness: batched result == sequential oracle merge on conformance +
     fuzz pieces,
  2. round counts + survivor curves per flavor (predicts device cost).

Safe rule: pair p=(B, C) with rank r merges this round iff
    r < minR[B]  and  r <= minL[C]
where minR[t] = min rank over ALL pair-table entries with t as right part,
minL[t] = min over entries with t as left part (the all-compositions table
from vocab/tables.py, which is what the device lookup uses). Columns with
no safe pair merge their leftmost min (the sequential step).
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jtokkit_tpu.engine import presplit
from jtokkit_tpu.engine.oracle import byte_pair_merge
from jtokkit_tpu.utils.corpus import generate
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import load_builtin_ranks

MAX = 1 << 60


LMAX = 8  # length clamp for the gt-length threat tables


def build_min_tables(ranks):
    """Length-bounded threat tables over the all-compositions pair table.

    minR_gt[t][l] = min rank over pair entries (X, t) with len(X) > l
    minL_gt[t][l] = min rank over pair entries (t, Y) with len(Y) > l
    for l in 1..LMAX (clamped: query l>LMAX uses LMAX, which is conservative
    since the tables are non-decreasing in l).
    """
    n = max(ranks.values()) + 1
    minL = np.full((n, LMAX + 1), MAX, dtype=np.int64)
    minR = np.full((n, LMAX + 1), MAX, dtype=np.int64)
    id_len = np.zeros(n, dtype=np.int64)
    for token, rank in ranks.items():
        id_len[rank] = len(token)
    for token, rank in ranks.items():
        if len(token) < 2:
            continue
        for s in range(1, len(token)):
            lu = ranks.get(token[:s])
            if lu is None:
                continue
            rv = ranks.get(token[s:])
            if rv is None:
                continue
            ll = min(s, LMAX)
            rl = min(len(token) - s, LMAX)
            # entry (lu, rv) threatens right-parts for any left len <= s-1...
            # fill: minR_gt[rv][l] for l < len(lu); minL_gt[lu][l] for l < len(rv)
            minR[rv, : ll] = np.minimum(minR[rv, : ll], rank)
            minL[lu, : rl] = np.minimum(minL[lu, : rl], rank)
    return minL, minR, id_len


CHAIN_K = 8  # bounded equal-rank chain unroll (device analog: shifted ANDs)


def batched_merge(piece, ranks, id_to_bytes, minL, minR, id_len, stats):
    """Safe-batched merge of one piece; returns token ids.

    Exact rule for pair p=(B,C) at i with left neighbor A, right neighbor D:
      L1: no current left pair (A,B), or rank(A,B) > r   [tie → left wins]
      L2: i == 0 (no A ever), or r < minR_gt[B][len(A)]  [future left:
          any X that consumes B later strictly contains A as a suffix]
      R1: no current right pair (C,D), or rank(C,D) >= r [tie → p is left]
      R2: i == m-2 (no D ever), or r <= minL_gt[C][len(D)]
    Equal-rank chains (rank[i-1] == r): L1 fails, but the sequential order
    merges chain positions left-to-right pairwise — even offsets from the
    chain head merge IF the head passes L1&L2 and every even predecessor in
    the chain passes its own L2&R1&R2 (prefix-AND; a failed even position
    makes the tail's sequential context unprovable this round).
    """
    ids = []
    for b in piece:
        ids.append(ranks[bytes([b])])
    lens = [1] * len(ids)
    rounds = 0
    work = 0
    while True:
        m = len(ids)
        if m <= 1:
            break
        pair_ranks = []
        for i in range(m - 1):
            r = ranks.get(id_to_bytes[ids[i]] + id_to_bytes[ids[i + 1]])
            pair_ranks.append(MAX if r is None else r)
        if all(r == MAX for r in pair_ranks):
            break
        rounds += 1
        work += m
        two_hop = os.environ.get("SIM_TWO_HOP", "1") != "0"
        base = []
        for i in range(m - 1):
            r = pair_ranks[i]
            if r == MAX:
                base.append(False)
                continue
            # -- left threats beyond the current (A,B) pair -----------------
            if i == 0:
                l2 = True  # piece-first span: no X can ever consume B
            elif not two_hop or i == 1:
                # no Z (A is piece-first): X = ZA impossible -> l2 pass when
                # two_hop; conservative table bound otherwise
                l2 = (i == 1 and two_hop) or r < minR[ids[i]][min(lens[i - 1], LMAX)]
            else:
                rza = pair_ranks[i - 2]  # current (Z, A) pair rank
                za_blocks = False
                if rza <= r and rza != MAX:
                    rxab = ranks.get(id_to_bytes[rza] + id_to_bytes[ids[i]])
                    za_blocks = rxab is not None and rxab <= r
                deeper = r < minR[ids[i]][min(lens[i - 2] + lens[i - 1], LMAX)]
                l2 = deeper and not za_blocks
            r1 = i == m - 2 or pair_ranks[i + 1] >= r
            # -- right threats beyond the current (C,D) pair ----------------
            if i >= m - 2:
                r2 = True
            elif not two_hop or i == m - 3:
                r2 = (i == m - 3 and two_hop) or (
                    r <= minL[ids[i + 1]][min(lens[i + 2], LMAX)]
                )
            else:
                rde = pair_ranks[i + 2]  # current (D, E) pair rank
                de_blocks = False
                if rde < r:
                    rcde = ranks.get(id_to_bytes[ids[i + 1]] + id_to_bytes[rde])
                    de_blocks = rcde is not None and rcde < r
                deeper = r <= minL[ids[i + 1]][min(lens[i + 2] + lens[i + 3], LMAX)]
                r2 = deeper and not de_blocks
            if rounds >= 4:
                l1 = i == 0 or pair_ranks[i - 1] > r
                stats["diag_valid"] += 1
                if l1 and r1 and not (l2 and r2):
                    stats["diag_table_blocked"] += 1
                elif not (l1 and r1):
                    stats["diag_local_blocked"] += 1
            base.append(l2 and r1 and r2)
        merged = [False] * (m - 1)
        for i in range(m - 1):
            r = pair_ranks[i]
            if not base[i]:
                continue
            if i == 0 or pair_ranks[i - 1] > r:
                merged[i] = True  # chain head (or no chain)
                continue
            if os.environ.get("SIM_CHAIN_R1_ONLY") and rounds > 1:
                continue
            if pair_ranks[i - 1] == r:
                # walk back the equal-rank chain (bounded)
                cs = i
                steps = 0
                ok = True
                while cs > 0 and pair_ranks[cs - 1] == r:
                    cs -= 1
                    steps += 1
                    if steps > CHAIN_K:
                        ok = False
                        break
                if not ok or (i - cs) % 2 == 1:
                    continue
                if cs > 0 and pair_ranks[cs - 1] <= r:
                    continue  # chain head blocked by its left pair
                # prefix-AND of base over even chain offsets up to i
                if all(base[j] for j in range(cs, i + 1, 2)):
                    merged[i] = True
        safe = [i for i in range(m - 1) if merged[i]]
        # overlap check (the rule guarantees non-overlap; verify)
        for a, b in zip(safe, safe[1:]):
            assert b > a + 1, f"overlapping merges {safe}"
        if not safe:
            best = min(range(m - 1), key=lambda i: pair_ranks[i])
            safe = [best]
            stats["fallback_rounds"] += 1
        stats["size_curve"][rounds] += m
        # max surviving spans after this round, per round index (validates
        # the device engine's width-halving compaction schedule)
        stats["max_survivors"][rounds] = max(
            stats["max_survivors"][rounds], m - len(safe)
        )
        out = []
        out_lens = []
        i = 0
        sset = set(safe)
        while i < len(ids):
            if i in sset:
                out.append(pair_ranks[i])
                out_lens.append(lens[i] + lens[i + 1])
                i += 2
            else:
                out.append(ids[i])
                out_lens.append(lens[i])
                i += 1
        ids = out
        lens = out_lens
    stats["rounds_hist"][rounds] += 1
    stats["max_rounds"] = max(stats["max_rounds"], rounds)
    stats["work"] += work
    stats["bytes"] += len(piece)
    stats["seq_rounds"] += len(piece) - len(ids)  # sequential = 1 merge/round
    stats["seq_work"] += sum(range(len(ids), len(piece) + 1))
    return ids


def main():
    d = BUILTIN_DEFINITIONS["cl100k_base"]
    ranks = load_builtin_ranks(d.vocab_name)
    id_to_bytes = {v: k for k, v in ranks.items()}

    t0 = time.time()
    minL, minR, id_len = build_min_tables(ranks)
    print(f"min tables built in {time.time()-t0:.1f}s")

    for flavor in ("cjk", "english", "mixed"):
        docs = generate(1, seed=0, flavor=flavor)
        stats = defaultdict(int)
        stats["rounds_hist"] = defaultdict(int)
        stats["size_curve"] = defaultdict(int)
        stats["max_survivors"] = defaultdict(int)
        checked = 0
        mismatch = 0
        lens = []
        for doc in docs:
            for a, b in presplit.split(doc, d.pattern):
                pb = doc[a:b].encode("utf-8")
                if ranks.get(pb) is not None:
                    continue  # direct hit, never merges
                lens.append(len(pb))
                got = batched_merge(pb, ranks, id_to_bytes, minL, minR, id_len, stats)
                want = byte_pair_merge(pb, ranks)
                checked += 1
                if got != want:
                    mismatch += 1
                    if mismatch <= 3:
                        print(f"  MISMATCH {pb[:40]!r}: {got[:10]} != {want[:10]}")
        lens = np.asarray(lens)
        hist = sorted(stats["rounds_hist"].items())
        print(f"\n=== {flavor}: {checked} merge pieces, {mismatch} mismatches ===")
        print(f"  piece len: mean {lens.mean():.0f} p50 {np.percentile(lens,50):.0f} "
              f"p99 {np.percentile(lens,99):.0f} max {lens.max()}")
        print(f"  batched rounds: max {stats['max_rounds']}, "
              f"hist {hist[:12]}{'...' if len(hist)>12 else ''}")
        print(f"  fallback rounds: {stats['fallback_rounds']}")
        print(f"  work ratio batched/seq: {stats['work']}/{stats['seq_work']} = "
              f"{stats['work']/max(stats['seq_work'],1):.3f}")
        print(f"  seq rounds total {stats['seq_rounds']} vs batched "
              f"{sum(r*c for r,c in stats['rounds_hist'].items())}")
        dv = max(stats["diag_valid"], 1)
        print(f"  plateau (r>=4) valid pairs: {stats['diag_valid']}, "
              f"local-blocked {stats['diag_local_blocked']/dv:.2%}, "
              f"table-blocked {stats['diag_table_blocked']/dv:.2%}")
        curve = sorted(stats["size_curve"].items())
        tot0 = curve[0][1] if curve else 1
        print("  size curve (round: active/round1):",
              [(r, round(c / tot0, 3)) for r, c in curve[:16]])
        print("  max survivors after round:",
              sorted(stats["max_survivors"].items())[:16])


if __name__ == "__main__":
    main()
