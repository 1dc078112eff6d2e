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
