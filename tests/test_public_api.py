"""Public API surface tests against the facade (the path a reference user
migrates to)."""

import pytest

from jtokkit_tpu import (
    Encodings,
    EncodingResult,
    EncodingType,
    SpecialTokenError,
    UnknownTokenError,
)

_REGISTRY = Encodings.new_default_encoding_registry()


@pytest.fixture(scope="module")
def cl100k():
    return _REGISTRY.get_encoding(EncodingType.CL100K_BASE)


def test_encode_decode(cl100k):
    assert cl100k.encode("Hello, world!") == [9906, 11, 1917, 0]
    assert cl100k.decode([9906, 11, 1917, 0]) == "Hello, world!"
    assert cl100k.decode_bytes([9906]) == b"Hello"


def test_encode_capped(cl100k):
    res = cl100k.encode_capped("one two three four five six seven", 3)
    assert isinstance(res, EncodingResult)
    assert len(res.tokens) == 3 and res.truncated
    assert "one two three four five six seven".startswith(cl100k.decode(res.tokens))


def test_count_tokens(cl100k):
    assert cl100k.count_tokens("a b c") == 3
    assert cl100k.count_tokens_ordinary("<|endoftext|>") > 1


def test_special_token_guard(cl100k):
    with pytest.raises(SpecialTokenError):
        cl100k.encode("x <|endoftext|> y")
    with pytest.raises(SpecialTokenError):
        cl100k.count_tokens("x <|fim_prefix|> y")


def test_decode_special_tokens(cl100k):
    # decode handles special ids via the reverse special map
    assert cl100k.decode([100257]) == "<|endoftext|>"
    with pytest.raises(UnknownTokenError):
        cl100k.decode([100_000_000])


def test_none_handling(cl100k):
    assert cl100k.encode(None) == []
    assert cl100k.encode_ordinary(None) == []
    assert cl100k.encode_capped(None, 5) == EncodingResult([], False)


def test_batch_matches_single(cl100k):
    texts = ["Hello, world!", "日本語", "", "  spaces  ", "I'm here"]
    batch = cl100k.encode_ordinary_batch(texts)
    assert batch == [cl100k.encode_ordinary(t) for t in texts]
    counts = cl100k.count_tokens_batch(texts)
    assert counts == [len(t) for t in batch]


def test_get_name(cl100k):
    assert cl100k.name == "cl100k_base"
    assert cl100k.get_name() == "cl100k_base"
