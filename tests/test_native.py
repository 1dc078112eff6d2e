"""Native C++ engine parity tests (skipped when the toolchain is absent)."""

import random

import pytest

from jtokkit_tpu import native
from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks
from jtokkit_tpu.vocab.tables import load_packed

from .conftest import load_conformance_rows

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)

_CACHE = {}


def engines(enc_name):
    if enc_name not in _CACHE:
        d = BUILTIN_DEFINITIONS[enc_name]
        ranks = load_builtin_ranks(d.vocab_name)
        orc = OracleEngine(d.name, d.pattern, ranks, d.special_tokens)
        packed = load_packed(d.vocab_name, ranks, asset_path(d.vocab_name))
        _CACHE[enc_name] = (orc, native.NativeEngine(packed, d.pattern))
    return _CACHE[enc_name]


def test_native_conformance(enc_name):
    orc, nat = engines(enc_name)
    for text, expected, _ in load_conformance_rows(enc_name):
        assert nat.encode_ordinary(text) == expected, repr(text)


def test_native_edge_cases(enc_name):
    orc, nat = engines(enc_name)
    for text in [
        "", "a", "中文" * 300, "🙂" * 100, "   \t\n\r\n  x", "a" * 5000,
        "'s'T're 'ſ", "1234567890", "\x00\xff?",
    ]:
        assert nat.encode_ordinary(text) == orc.encode_ordinary(text)[0], repr(text)


def test_native_fuzz(enc_name):
    orc, nat = engines(enc_name)
    rng = random.Random(11)
    bits = ["ab", "'s", "'RE", "'ſ", "12", " ", "\t", "\n", "\r\n", "!", "—",
            "中", "🙂", "　", "\xa0", "$", "'"]
    for _ in range(800):
        s = "".join(rng.choice(bits) for _ in range(rng.randint(0, 16)))
        assert nat.encode_ordinary(s) == orc.encode_ordinary(s)[0], repr(s)


def test_facade_uses_native():
    from jtokkit_tpu import Encodings, EncodingType

    enc = Encodings.new_lazy_encoding_registry().get_encoding(
        EncodingType.CL100K_BASE
    )
    assert enc.native_engine() is not None
    assert enc.encode("Hello, world!") == [9906, 11, 1917, 0]
