"""Registry behavior tests (mirrors reference ``T/BaseEncodingRegistryTest.java``,
run against both registry flavors via parametrization, plus the lazy
registry's starts-empty assertion from ``T/LazyEncodingRegistryTest.java:19-24``)."""

import pytest

from jtokkit_tpu import (
    DuplicateEncodingError,
    Encoding,
    Encodings,
    EncodingType,
    GptBytePairEncodingParams,
    ModelType,
)


@pytest.fixture(params=["default", "lazy"])
def registry(request):
    if request.param == "default":
        return Encodings.new_default_encoding_registry()
    return Encodings.new_lazy_encoding_registry()


def test_get_encoding_by_type(registry):
    for t in EncodingType:
        enc = registry.get_encoding(t)
        assert enc is not None
        assert enc.name == t.encoding_name


def test_get_encoding_by_name(registry):
    for t in EncodingType:
        enc = registry.get_encoding(t.encoding_name)
        assert enc is not None and enc.name == t.encoding_name


def test_get_encoding_unknown_name_returns_none(registry):
    assert registry.get_encoding("nonexistent") is None


def test_get_encoding_for_model_type(registry):
    for m in ModelType:
        enc = registry.get_encoding_for_model(m)
        assert enc.name == m.encoding_type.encoding_name


def test_get_encoding_for_model_name(registry):
    for m in ModelType:
        enc = registry.get_encoding_for_model(m.model_name)
        assert enc is not None and enc.name == m.encoding_type.encoding_name


@pytest.mark.parametrize(
    "model_name,expected",
    [
        ("gpt-4-0314", EncodingType.CL100K_BASE),
        ("gpt-4-32k-0314", EncodingType.CL100K_BASE),
        ("gpt-3.5-turbo-0301", EncodingType.CL100K_BASE),
        ("gpt-3.5-turbo-16k-0613", EncodingType.CL100K_BASE),
    ],
)
def test_prefix_fallback(registry, model_name, expected):
    enc = registry.get_encoding_for_model(model_name)
    assert enc is not None and enc.name == expected.encoding_name


def test_unknown_model_returns_none(registry):
    assert registry.get_encoding_for_model("unknown-model") is None


def test_register_custom_bpe(registry):
    params = GptBytePairEncodingParams(
        name="custom",
        pattern="gpt2",
        encoder={bytes([i]): i for i in range(256)},
        special_tokens_encoder={},
    )
    registry.register_gpt_byte_pair_encoding(params)
    enc = registry.get_encoding("custom")
    assert enc is not None
    assert enc.encode("ab") == [97, 98]


def test_register_custom_encoding_object(registry):
    class DummyEncoding(Encoding):
        def encode(self, text):
            return [42]

        def encode_capped(self, text, max_tokens):
            from jtokkit_tpu import EncodingResult

            return EncodingResult([42], False)

        def encode_ordinary(self, text):
            return [42]

        def encode_ordinary_capped(self, text, max_tokens):
            from jtokkit_tpu import EncodingResult

            return EncodingResult([42], False)

        def decode_bytes(self, tokens):
            return b"dummy"

        @property
        def name(self):
            return "dummy"

    registry.register_custom_encoding(DummyEncoding())
    enc = registry.get_encoding("dummy")
    assert enc.encode("anything") == [42]


def test_duplicate_registration_raises(registry):
    params = GptBytePairEncodingParams(
        name="dup", pattern="gpt2", encoder={b"a": 0}, special_tokens_encoder={}
    )
    registry.register_gpt_byte_pair_encoding(params)
    with pytest.raises(DuplicateEncodingError):
        registry.register_gpt_byte_pair_encoding(params)


def test_custom_regex_pattern_encoding(registry):
    """Custom encodings may use arbitrary regex pre-split patterns."""
    params = GptBytePairEncodingParams(
        name="bytes-words",
        pattern=r"\w+|\S",
        encoder={bytes([i]): i for i in range(256)},
        special_tokens_encoder={},
    )
    registry.register_gpt_byte_pair_encoding(params)
    enc = registry.get_encoding("bytes-words")
    assert enc.encode("hi!") == [104, 105, 33]


def test_lazy_registry_starts_empty():
    lazy = Encodings.new_lazy_encoding_registry()
    assert lazy._encodings == {}
    lazy.get_encoding(EncodingType.CL100K_BASE)
    assert set(lazy._encodings) == {"cl100k_base"}


def test_default_registry_eager():
    default = Encodings.new_default_encoding_registry()
    assert set(default._encodings) == {t.encoding_name for t in EncodingType}


def test_model_type_metadata():
    assert ModelType.GPT_4.get_max_context_length() == 8192
    assert ModelType.GPT_4.get_encoding_type() == EncodingType.CL100K_BASE
    assert ModelType.from_name("gpt-4") is ModelType.GPT_4
    assert ModelType.from_name("no-such") is None
    assert len(list(ModelType)) == 33


def test_encoding_type_from_name():
    assert EncodingType.from_name("cl100k_base") is EncodingType.CL100K_BASE
    assert EncodingType.from_name("bogus") is None
