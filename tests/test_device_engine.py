"""Device-engine parity tests: the JAX pipeline (classify → boundaries →
merge → stitch) must match the host oracle bit-exactly on the conformance
corpus, adversarial whitespace/Unicode cases, and random fuzz."""

import random

import numpy as np
import pytest

from jtokkit_tpu.engine.device import DeviceEngine
from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import load_builtin_ranks

from .conftest import load_conformance_rows

_CACHE = {}


def engines(enc_name):
    if enc_name not in _CACHE:
        d = BUILTIN_DEFINITIONS[enc_name]
        orc = OracleEngine(
            d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
        )
        _CACHE[enc_name] = (orc, DeviceEngine.from_oracle(orc))
    return _CACHE[enc_name]


def check_batch(enc_name, texts):
    orc, dev = engines(enc_name)
    got = dev.encode_ordinary_batch(texts)
    for t, g in zip(texts, got):
        assert g == orc.encode_ordinary(t)[0], repr(t)


def test_device_conformance_corpus(enc_name):
    texts = [t for t, _, _ in load_conformance_rows(enc_name)]
    check_batch(enc_name, texts)


def test_device_edge_cases(enc_name):
    check_batch(
        enc_name,
        [
            "",
            None,
            " ",
            "   \t\n  \r\n   ",
            "a",
            "\x00\x01\x1c\x7f\xff?",
            "中文" * 300,  # long CJK piece (single regex piece)
            "🙂" * 150,
            "word " * 400,
            "1234567890" * 30,
            "'s't're've'm'll'd 'S'T'RE",
            "a" * 5000,  # piece larger than the biggest bucket → host fallback
            "<|endoftext|>",
            "　　a",
        ],
    )


def test_device_fuzz(enc_name):
    rng = random.Random(99)
    bits = [
        "ab", "'s", "'RE", "'ſ", "1234", "  ", "\t", " ", "\n", "\r\n",
        "!!", "—", "中文", "🙂", "　", "\xa0", "x", "$", "'", "é", "ß",
    ]
    texts = [
        "".join(rng.choice(bits) for _ in range(rng.randint(0, 20)))
        for _ in range(300)
    ]
    check_batch(enc_name, texts)


def test_overflow_fallback_exact():
    """Adversarial all-1-byte-piece input overflows the piece table and must
    fall back to the host path with identical output."""
    orc, dev = engines("cl100k_base")
    text = "a1" * 80_000  # alternating letter/digit: every piece is 1 byte
    got = dev.encode_ordinary_batch([text])
    assert got[0] == orc.encode_ordinary(text)[0]


def test_count_tokens_batch(enc_name):
    orc, dev = engines(enc_name)
    texts = ["hello world", "日本語", "", "a b c"]
    assert dev.count_tokens_batch(texts) == [
        len(orc.encode_ordinary(t)[0]) for t in texts
    ]


def test_public_batch_uses_device():
    """encode_ordinary_batch through the facade routes to the device engine
    and matches single-text encode."""
    from jtokkit_tpu import Encodings, EncodingType

    enc = Encodings.new_lazy_encoding_registry().get_encoding(
        EncodingType.CL100K_BASE
    )
    texts = ["Hello, world!", "I'm 42 — ĄĘ中🙂", ""]
    assert enc.device_engine() is not None
    assert enc.encode_ordinary_batch(texts) == [enc.encode_ordinary(t) for t in texts]


def test_plan_cache_steady_state():
    """A warmed CorpusPlan must reproduce first-pass results exactly with
    zero mid-pass metadata syncs (steady-state bench protocol)."""
    orc, dev = engines("cl100k_base")
    texts = [
        "Steady state pass %d: the quick brown fox jumps. " % i * (1 + i % 4)
        for i in range(12)
    ] + ["日本語テキスト " * 6, "", "punct!!! ??? \n\n  mixed 12345"]
    expect = [orc.encode_ordinary(t)[0] for t in texts]

    plan = dev.preload_corpus(texts)
    assert plan.chunk_cache is None
    total1 = dev.count_tokens_corpus(texts, plan=plan)
    assert plan.chunk_cache is not None, "first pass must warm the plan"
    # second count pass takes the cached-dispatch path
    assert dev.count_tokens_corpus(texts, plan=plan) == total1
    assert total1 == sum(len(e) for e in expect)

    # first encode pass populates n_tokens/doc_counts; second reuses them
    got1 = dev.encode_ordinary_batch_arrays(None, plan=plan)
    assert plan.n_tokens is not None and plan.doc_counts is not None
    got2 = dev.encode_ordinary_batch_arrays(None, plan=plan)
    assert [g.tolist() for g in got1] == expect
    assert [g.tolist() for g in got2] == expect
