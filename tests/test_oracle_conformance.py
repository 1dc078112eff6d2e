"""Golden conformance tests for the host oracle engine.

Mirrors the reference's parameterized CSV tests
(reference ``T/reference/Cl100kBaseTestTest.java:21-111``): exact token ids,
roundtrip, truncation with the precomputed maxTokens=10 column, truncated
decode being a string prefix, encodeOrdinary variants, and special-token
literals roundtripping through encode_ordinary.
"""

import pytest

from jtokkit_tpu.api.errors import SpecialTokenError
from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import load_builtin_ranks

from .conftest import load_conformance_rows

_ENGINES = {}


def engine_for(enc_name: str) -> OracleEngine:
    if enc_name not in _ENGINES:
        d = BUILTIN_DEFINITIONS[enc_name]
        _ENGINES[enc_name] = OracleEngine(
            d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
        )
    return _ENGINES[enc_name]


def test_encodes_correctly(enc_name):
    eng = engine_for(enc_name)
    for text, expected, _ in load_conformance_rows(enc_name):
        assert eng.encode(text)[0] == expected, repr(text)


def test_encodes_stable(enc_name):
    eng = engine_for(enc_name)
    for text, _, _ in load_conformance_rows(enc_name):
        tokens, _ = eng.encode(text)
        assert eng.decode(tokens) == text, repr(text)


def test_encodes_correctly_with_max_tokens(enc_name):
    eng = engine_for(enc_name)
    for text, expected, expected10 in load_conformance_rows(enc_name):
        tokens, truncated = eng.encode(text, 10)
        assert tokens == expected10, repr(text)
        assert truncated == (len(expected) > len(expected10)), repr(text)


def test_encodes_stable_with_max_tokens(enc_name):
    eng = engine_for(enc_name)
    for text, _, _ in load_conformance_rows(enc_name):
        tokens, _ = eng.encode(text, 10)
        assert text.startswith(eng.decode(tokens)), repr(text)


def test_encode_ordinary_correctly(enc_name):
    eng = engine_for(enc_name)
    for text, expected, _ in load_conformance_rows(enc_name):
        assert eng.encode_ordinary(text)[0] == expected, repr(text)


def test_encode_ordinary_with_max_tokens(enc_name):
    eng = engine_for(enc_name)
    for text, expected, expected10 in load_conformance_rows(enc_name):
        tokens, truncated = eng.encode_ordinary(text, 10)
        assert tokens == expected10, repr(text)
        assert truncated == (len(expected) > len(expected10)), repr(text)


def test_special_tokens_raise_on_encode(enc_name):
    eng = engine_for(enc_name)
    for special in eng.special_tokens:
        with pytest.raises(SpecialTokenError):
            eng.encode(f"Hello {special} world")


def test_encode_ordinary_roundtrips_special_tokens(enc_name):
    eng = engine_for(enc_name)
    text = "Hello " + " ".join(engine_for(enc_name).special_tokens) + " world"
    tokens, _ = eng.encode_ordinary(text)
    assert eng.decode(tokens) == text


def test_count_tokens(enc_name):
    eng = engine_for(enc_name)
    for text, expected, _ in load_conformance_rows(enc_name)[:50]:
        assert eng.count_tokens(text) == len(expected)
        assert eng.count_tokens_ordinary(text) == len(expected)


def test_null_input_empty_result(enc_name):
    eng = engine_for(enc_name)
    assert eng.encode(None) == ([], False)
    assert eng.encode_ordinary(None) == ([], False)
    assert eng.encode("") == ([], False)


def test_decode_unknown_token_raises(enc_name):
    from jtokkit_tpu.api.errors import UnknownTokenError

    eng = engine_for(enc_name)
    with pytest.raises(UnknownTokenError):
        eng.decode_bytes([99_999_999])
