"""Vocabulary-loader error paths.

The reference throws ``IllegalStateException`` for malformed lines and
missing resources (``M/EncodingFactory.java:142,151,162``); here the same
conditions raise :class:`VocabularyLoadError`.
"""

import pytest

from jtokkit_tpu.api.errors import VocabularyLoadError
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks, load_ranks


def test_missing_file_raises(tmp_path):
    with pytest.raises(VocabularyLoadError, match="Could not find"):
        load_ranks(str(tmp_path / "nope.tiktoken"))


def test_malformed_line_missing_rank(tmp_path):
    p = tmp_path / "bad.tiktoken"
    p.write_text("IQ==\n")  # token with no rank column
    with pytest.raises(VocabularyLoadError, match="Invalid line"):
        load_ranks(str(p))


def test_malformed_base64(tmp_path):
    p = tmp_path / "bad.tiktoken"
    p.write_text("@@notbase64@@ 17\n")
    with pytest.raises(VocabularyLoadError, match="Invalid line"):
        load_ranks(str(p))


def test_malformed_rank(tmp_path):
    p = tmp_path / "bad.tiktoken"
    p.write_text("IQ== seventeen\n")
    with pytest.raises(VocabularyLoadError, match="Invalid line"):
        load_ranks(str(p))


def test_blank_lines_skipped(tmp_path):
    p = tmp_path / "ok.tiktoken"
    p.write_text("IQ== 0\n\nIg== 1\n")
    ranks = load_ranks(str(p))
    assert ranks == {b"!": 0, b'"': 1}


def test_unknown_builtin_name():
    with pytest.raises(VocabularyLoadError, match="No built-in vocabulary"):
        asset_path("q99k_base")


def test_builtin_assets_load():
    for name in ("r50k_base", "p50k_base", "p50k_edit", "cl100k_base"):
        ranks = load_builtin_ranks(name)
        assert len(ranks) > 50_000
        # every single byte must be a token for the BPE merge to be total
        assert all(bytes([b]) in ranks for b in range(256))
