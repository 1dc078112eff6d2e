"""Pre-split scanner unit tests: tiling invariant, Java-regex semantics edge
cases, and differential fuzz against regex-module equivalents of the two
patterns (reference ``M/EncodingFactory.java:63,105``)."""

import random

import pytest
import regex

from jtokkit_tpu.engine import presplit

# Java \s under UNICODE_CHARACTER_CLASS == Unicode White_Space. Python's \s
# additionally matches U+001C..1F, so spell the class out explicitly.
_WS = (
    "\\t\\n\\x0b\\f\\r \\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000"
)
_GPT2_RX = regex.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^W\p{L}\p{N}]+|[W]+(?![^W])|[W]+".replace(
        "W", _WS
    )
)
_CL100K_RX = regex.compile(
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^W\p{L}\p{N}]+[\r\n]*|[W]*[\r\n]+|[W]+(?![^W])|[W]+".replace(
        "W", _WS
    )
)


CASES = [
    "",
    "Hello world!",
    "I'm you're we'LL IT'S",
    "x 'tis 'twas",
    "a  b   c\t\td",
    "1234567 12 123 1234",
    "\n\n  \n hello \n\n ",
    "word\r\nword\rword\nword",
    ".\n\n!!\r\n",
    "  trailing  ",
    " ",
    "　　a",
    "日本語テキスト中文混合",
    "🙂🙂 👨‍👩‍👧‍👦!",
    "tab\tsep\tvals",
    "—dash–y things…",
    "a\x00b\x01",
    "price: $1,234.56 (50%)",
    "\x85\xa0  ",
    "don't CAN'T Won'T",
]


@pytest.mark.parametrize("pattern,rx,fn", [
    ("gpt2", _GPT2_RX, presplit.split_gpt2),
    ("cl100k", _CL100K_RX, presplit.split_cl100k),
])
def test_known_cases(pattern, rx, fn):
    for s in CASES:
        expect = [m.group() for m in rx.finditer(s)]
        got = [s[a:b] for a, b in fn(s)]
        assert got == expect, f"{pattern}: {s!r}"


@pytest.mark.parametrize("fn", [presplit.split_gpt2, presplit.split_cl100k])
def test_pieces_tile_input(fn):
    for s in CASES:
        spans = list(fn(s))
        pos = 0
        for a, b in spans:
            assert a == pos and b > a
            pos = b
        assert pos == len(s)


@pytest.mark.parametrize("pattern,rx,fn", [
    ("gpt2", _GPT2_RX, presplit.split_gpt2),
    ("cl100k", _CL100K_RX, presplit.split_cl100k),
])
def test_fuzz_against_regex_module(pattern, rx, fn):
    rng = random.Random(42)
    alphabet = list("abZ 09'\t\n\r.—中🙂　\xa0") + ["'s", "'LL", "1234", "\r\n", "  "]
    for _ in range(1500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        expect = [m.group() for m in rx.finditer(s)]
        got = [s[a:b] for a, b in fn(s)]
        assert got == expect, repr(s)
