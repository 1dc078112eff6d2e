"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's multi-host test requirements: sharded-corpus encode
equals single-host encode, and psum'd counts equal the sum of per-shard
counts."""

import jax
import numpy as np
import pytest

from jtokkit_tpu.engine.device import DeviceEngine
from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.parallel.mesh import data_mesh
from jtokkit_tpu.parallel.sharded import ShardedTokenizer
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import load_builtin_ranks

_STATE = {}


def sharded():
    if not _STATE:
        d = BUILTIN_DEFINITIONS["cl100k_base"]
        orc = OracleEngine(
            d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
        )
        eng = DeviceEngine.from_oracle(orc)
        _STATE["orc"] = orc
        _STATE["tok"] = ShardedTokenizer(eng, data_mesh())
    return _STATE["orc"], _STATE["tok"]


TEXTS = [
    "Hello, world! This is shard content.",
    "日本語のテキスト、そして emoji 🙂🙂",
    "",
    "short",
    "  whitespace   runs\n\nand newlines\r\n",
    "I'm counting 1234567 tokens' worth of text.",
    "Ω≈ç√∫˜µ≤≥÷ — punctuation galore!!!",
    "yet another document " * 40,
    "中文" * 120,
]


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_encode_matches_oracle():
    orc, tok = sharded()
    got = tok.encode_ordinary_batch(TEXTS)
    for t, g in zip(TEXTS, got):
        assert g == orc.encode_ordinary(t)[0], repr(t)


def test_sharded_count_matches_encode():
    orc, tok = sharded()
    expect = sum(len(orc.encode_ordinary(t)[0]) for t in TEXTS)
    assert tok.count_tokens_corpus(TEXTS) == expect


def test_sharded_empty():
    _orc, tok = sharded()
    assert tok.encode_ordinary_batch([]) == []
    assert tok.count_tokens_corpus([]) == 0
    assert tok.encode_ordinary_batch(["", ""]) == [[], []]


def test_sharded_plan_reuse():
    """Preloaded plan: repeated passes re-compute on device but skip the
    re-shard/re-upload/meta sync, and results stay exact."""
    orc, tok = sharded()
    plan = tok.preload_corpus(TEXTS)
    expect = [orc.encode_ordinary(t)[0] for t in TEXTS]
    total = sum(len(e) for e in expect)
    assert tok.count_tokens_corpus(None, plan=plan) == total
    assert tok.count_tokens_corpus(None, plan=plan) == total
    for _ in range(2):
        got = tok.encode_ordinary_batch_arrays(None, plan=plan)
        assert [g.tolist() for g in got] == expect


def test_sharded_long_piece_degrades_only_that_doc():
    """A single pathological document (one >4096-byte regex piece) must NOT
    drag the whole corpus off the mesh: only its shard takes the single-chip
    engine fallback, every other document stays on the sharded path."""
    orc, tok = sharded()
    texts = list(TEXTS) + ["a" * 5000]  # one 5000-byte letter-run piece
    plan = tok.preload_corpus(texts)
    assert plan.bad_shards, "pathological doc should overflow its shard"
    assert len(plan.bad_shards) < tok.n_dev, "only one shard should degrade"
    expect = [orc.encode_ordinary(t)[0] for t in texts]
    got = tok.encode_ordinary_batch_arrays(None, plan=plan)
    assert [g.tolist() for g in got] == expect
    assert tok.count_tokens_corpus(None, plan=plan) == sum(
        len(e) for e in expect
    )
