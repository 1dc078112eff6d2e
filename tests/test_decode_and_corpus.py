"""Device decode-batch parity and synthetic-corpus parity tests."""

from jtokkit_tpu import Encodings, EncodingType
from jtokkit_tpu.utils.corpus import generate

_ENC = Encodings.new_lazy_encoding_registry()


def cl100k():
    return _ENC.get_encoding(EncodingType.CL100K_BASE)


def test_decode_batch_matches_host():
    enc = cl100k()
    texts = ["Hello, world!", "日本語🙂テスト", "", "I'm 42.", "  spaces  "]
    toks = [enc.encode(t) for t in texts]
    assert enc.decode_batch(toks) == texts
    assert enc.decode_bytes_batch(toks) == [t.encode("utf-8") for t in texts]


def test_decode_batch_special_and_unknown():
    import pytest

    from jtokkit_tpu import UnknownTokenError

    enc = cl100k()
    assert enc.decode_batch([[100257], [9906]]) == ["<|endoftext|>", "Hello"]
    with pytest.raises(UnknownTokenError):
        enc.decode_batch([[99_999_999]])


def test_corpus_generator_deterministic():
    a = generate(0.2, seed=3)
    b = generate(0.2, seed=3)
    assert a == b
    assert sum(len(d.encode()) for d in a) >= 200_000


def test_corpus_flavors_roundtrip_device():
    enc = cl100k()
    for flavor in ("english", "mixed", "cjk"):
        docs = generate(0.12, seed=1, flavor=flavor)[:2]
        batch = enc.encode_ordinary_batch(docs)
        for d, toks in zip(docs, batch):
            assert toks == enc.encode_ordinary(d), flavor
