"""Differential tests for the wide-bucket hybrid merge (ops/merge_exact).

Every padded-bucket merge must reproduce the host oracle's sequential
byte-pair merge (reference ``M/GptBytePairEncoding.java:200-275``) token
for token, including the batched byte round's equal-rank chain and
forced-step paths and the width-halving compaction phases.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtokkit_tpu.engine import presplit
from jtokkit_tpu.engine.oracle import byte_pair_merge
from jtokkit_tpu.ops import merge_exact
from jtokkit_tpu.vocab import tables as vtables
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks

_CACHE = {}


def setup(enc_name):
    if enc_name not in _CACHE:
        d = BUILTIN_DEFINITIONS[enc_name]
        ranks = load_builtin_ranks(d.vocab_name)
        packed = vtables.load_packed(enc_name, ranks, asset_path(enc_name))
        zeros = np.zeros_like(packed.cuckoo_u[0])
        rows_cat = jnp.asarray(np.concatenate([
            np.stack(
                [packed.cuckoo_u[t], packed.cuckoo_v[t], packed.cuckoo_id[t],
                 packed.cuckoo_safe[t]], axis=1)
            for t in (0, 1)
        ], axis=0))
        del zeros
        _CACHE[enc_name] = (d, ranks, packed, rows_cat, None)
    return _CACHE[enc_name]


def run_bucket(enc_name, pieces, lanes):
    """Merge `pieces` (all <= lanes bytes) through merge_bucket_exact."""
    d, ranks, packed, rows_cat, _ = setup(enc_name)
    cap = max(128, 1 << (len(pieces) - 1).bit_length())
    buf = np.frombuffer(b"".join(pieces), dtype=np.uint8)
    starts = np.zeros(len(pieces), dtype=np.int32)
    lens = np.asarray([len(p) for p in pieces], dtype=np.int32)
    starts[1:] = np.cumsum(lens)[:-1]
    pad = cap
    starts_p = np.zeros(pad, np.int32)
    lens_p = np.zeros(pad, np.int32)
    starts_p[: len(pieces)] = starts
    lens_p[: len(pieces)] = lens
    miss_sorted = np.arange(pad, dtype=np.int32)

    fn = jax.jit(
        lambda b, s, l, ms: merge_exact.merge_bucket_exact(
            b, s, l, ms, jnp.int32(0), jnp.int32(len(pieces)),
            jnp.asarray(packed.byte_to_id), jnp.asarray(packed.byte_pair_seed),
            rows_cat, packed.table_mask,
            lanes=lanes, cap=cap,
        )
    )
    cols, outs = fn(
        jnp.asarray(buf), jnp.asarray(starts_p), jnp.asarray(lens_p),
        jnp.asarray(miss_sorted),
    )
    cols = np.asarray(cols)
    results = [[] for _ in pieces]
    seen = np.zeros(len(pieces), dtype=bool)
    for ids_k, act_k in outs:
        ids_k = np.asarray(ids_k)
        act_k = np.asarray(act_k)
        for r in range(cap):
            p = cols[r]
            if r >= len(pieces) or not act_k[:, r].any():
                continue
            assert not seen[p], f"piece {p} emitted twice"
            seen[p] = True
            results[p] = ids_k[act_k[:, r], r].tolist()
    return results


def check(enc_name, pieces, lanes):
    ranks = setup(enc_name)[1]
    got = run_bucket(enc_name, pieces, lanes)
    for p, g in zip(pieces, got):
        want = byte_pair_merge(p, ranks)
        assert g == want, f"{p!r}: {g[:12]} != {want[:12]}"


CASES = [
    b"hello", b"  ", b"    ", b" " * 31, b"-" * 24, b"aaaaaaaaaaaa",
    b"\xe4\xb8\xad\xe6\x96\x87" * 5, b"qwertyuiop", b"J\xc3\xbcrgen",
    b"\xff\xfe\xfd\xfc", b"ab", b"xy", b"\x00\x01\x02", b"zzzz",
    b"interdisciplinary", b"\xf0\x9f\x99\x82\xf0\x9f\x9a\x80",
    b"\r\n\r\n\r\n", b"\t\t\t\t\t\t\t\t\t\t", b"0123456789",
]


@pytest.mark.parametrize("enc_name", ["cl100k_base", "r50k_base"])
def test_merge_exact_cases(enc_name):
    check(enc_name, [p for p in CASES if len(p) <= 32], 32)


@pytest.mark.parametrize("enc_name", ["cl100k_base", "p50k_base"])
def test_merge_exact_conformance_pieces(enc_name):
    """All merge-needing pieces of the golden corpus, bucketed as the engine
    would bucket them."""
    from .conftest import load_conformance_rows

    d, ranks = setup(enc_name)[:2]
    pieces = set()
    for text, _, _ in load_conformance_rows(enc_name):
        for a, b in presplit.split(text, d.pattern):
            pb = text[a:b].encode("utf-8")
            if ranks.get(pb) is None and len(pb) >= 2:
                pieces.add(pb)
    pieces = sorted(pieces)
    for lanes in (8, 16, 32, 64, 128):
        lo = 0 if lanes == 8 else lanes // 2
        batch = [p for p in pieces if lo < len(p) <= lanes]
        if batch:
            check(enc_name, batch, lanes)


def test_merge_exact_cjk_long():
    cjk = "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于就下得可你年生自会那后能对着事其里所去行过家十用发天如然作方成者多日都三小军二无同么经法当起与好看学进种将还分此心"
    rng = random.Random(7)
    pieces = []
    for _ in range(40):
        n = rng.randint(30, 180)
        pieces.append("".join(rng.choice(cjk) for _ in range(n)).encode("utf-8"))
    check("cl100k_base", pieces, 1 << (max(len(p) for p in pieces) - 1).bit_length())


def test_merge_exact_fuzz_bytes():
    rng = random.Random(3)
    pieces = []
    for _ in range(120):
        n = rng.randint(2, 64)
        pieces.append(bytes(rng.randrange(256) for _ in range(n)))
    check("cl100k_base", pieces, 64)


def test_merge_exact_repeat_runs():
    """Equal-rank chains: repeated bytes/whitespace of many lengths."""
    pieces = []
    for ch in (b" ", b"-", b"a", b"\t", b"=", b"\n", b"\xe4"):
        for n in (2, 3, 5, 8, 13, 31, 64, 120):
            pieces.append(ch * n)
    pieces = [p for p in pieces if len(p) <= 128]
    check("cl100k_base", pieces, 128)
    check("r50k_base", pieces, 128)


def test_pair_lookup_cat_equivalence(enc_name):
    """The stacked-table single-gather lookup must equal the two-gather
    cuckoo lookup on random id pairs (hits and misses)."""
    from jtokkit_tpu.ops import merge as merge_ops

    _d, _ranks, packed, rows_cat, _ = setup(enc_name)
    T = packed.table_mask + 1
    rows0, rows1 = rows_cat[:T], rows_cat[T:]
    rng = np.random.default_rng(7)
    n = packed.n_tokens
    # half random (nearly all misses), half real table entries (hits)
    u = rng.integers(0, n, size=2048, dtype=np.int32)
    v = rng.integers(0, n, size=2048, dtype=np.int32)
    r0 = np.asarray(rows0)
    live = np.flatnonzero(r0[:, 2] >= 0)[:1024]
    u[: len(live)] = r0[live, 0]
    v[: len(live)] = r0[live, 1]
    u, v = jnp.asarray(u), jnp.asarray(v)
    a = merge_ops.pair_lookup_rows(u, v, rows0, rows1, packed.table_mask)
    b = merge_ops.pair_lookup_cat(u, v, rows_cat, packed.table_mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int((np.asarray(a) >= 0).sum()) >= len(live) > 0


def test_engine_wide_routing_parity(monkeypatch):
    """Full device engine with the wide hybrid enabled (lanes >= 64) must
    reproduce the oracle on long-piece CJK/punctuation documents, across
    cold, steady (mapped count), and encode passes."""
    monkeypatch.setenv("JTOKKIT_TPU_WIDE_MIN", "64")
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine

    d, ranks, _p, _rc, _ = setup("cl100k_base")
    orc = OracleEngine(d.name, d.pattern, ranks, d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)
    assert eng._wide_min_lanes == 64
    docs = [
        "今日はよい天気です"
        "東京都港区" * 12,        # long CJK letter run
        "." * 200 + "!" * 90,                          # punctuation runs
        "mixed 短い run with spaces and 漢字" * 6,
        "plain english words stay on the narrow engine.",
    ]
    want = [orc.encode_ordinary(t)[0] for t in docs]
    got = eng.encode_ordinary_batch(docs)
    assert got == want
    plan = eng.preload_corpus(docs)
    total = eng.count_tokens_corpus(docs, plan=plan)
    assert total == sum(len(t) for t in want)
    assert eng.count_tokens_corpus(None, plan=plan) == total  # mapped pass
