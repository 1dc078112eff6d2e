"""ChatML token-counting recipe tests (reference
``docs/docs/getting-started/recipes/chatml.md``)."""

import pytest

from jtokkit_tpu import Encodings
from jtokkit_tpu.recipes.chatml import ChatMessage, count_message_tokens

_REG = Encodings.new_lazy_encoding_registry()

MESSAGES = [
    ChatMessage("system", "You are a helpful assistant."),
    ChatMessage("user", "Count my tokens please!"),
    ChatMessage("user", "With a name too.", name="alice"),
]


def test_gpt4_framing():
    enc = _REG.get_encoding_for_model("gpt-4")
    content = sum(
        enc.count_tokens(m.content) + enc.count_tokens(m.role) for m in MESSAGES
    )
    names = enc.count_tokens("alice") + 1  # tokens_per_name = 1
    expected = content + names + 3 * len(MESSAGES) + 3
    assert count_message_tokens(_REG, "gpt-4", MESSAGES) == expected


def test_gpt35_framing():
    enc = _REG.get_encoding_for_model("gpt-3.5-turbo")
    content = sum(
        enc.count_tokens(m.content) + enc.count_tokens(m.role) for m in MESSAGES
    )
    names = enc.count_tokens("alice") - 1  # role omitted when name present
    expected = content + names + 4 * len(MESSAGES) + 3
    assert count_message_tokens(_REG, "gpt-3.5-turbo", MESSAGES) == expected


def test_unsupported_model():
    with pytest.raises(ValueError):
        count_message_tokens(_REG, "davinci", MESSAGES)
    with pytest.raises(ValueError):
        count_message_tokens(_REG, "unknown-model", MESSAGES)


def test_special_tokens_in_content_raise():
    from jtokkit_tpu import SpecialTokenError

    with pytest.raises(SpecialTokenError):
        count_message_tokens(
            _REG, "gpt-4", [ChatMessage("user", "hi <|endoftext|>")]
        )
