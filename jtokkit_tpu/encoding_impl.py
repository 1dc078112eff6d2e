"""Concrete byte-pair encoding bound to the host oracle and (lazily) the
device engine.

Single-text calls follow the reference's semantics exactly via the host
engine (reference ``M/GptBytePairEncoding.java``); batch calls route through
the TPU device engine when available, falling back to the host engine (the
two are differential-tested to be identical).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence

from .api.encoding import Encoding, EncodingResult
from .api.params import GptBytePairEncodingParams
from .engine.oracle import OracleEngine
from .engine.presplit import BUILTIN_PATTERNS


class GptBytePairEncoding(Encoding):
    """A tiktoken-compatible BPE encoding."""

    def __init__(self, params: GptBytePairEncodingParams):
        self._params = params
        self._oracle = OracleEngine(
            params.name,
            params.pattern,
            params.encoder,
            params.special_tokens_encoder,
        )
        self._device_engine = None
        self._device_lock = threading.Lock()

    # -- engines --------------------------------------------------------

    @property
    def oracle(self) -> OracleEngine:
        return self._oracle

    def device_engine(self):
        """The JAX device engine for this encoding (built on first use).

        Only built-in pre-split families run vectorized on device; custom
        regex patterns return ``None`` and stay on the host path.
        """
        if self._params.pattern not in BUILTIN_PATTERNS:
            return None
        if self._device_engine is None:
            with self._device_lock:
                if self._device_engine is None:
                    try:
                        from .engine.device import DeviceEngine
                    except ImportError:  # no JAX in this environment
                        return None
                    self._device_engine = DeviceEngine.from_oracle(self._oracle)
        return self._device_engine

    # -- Encoding contract ---------------------------------------------

    def encode(self, text: Optional[str]) -> List[int]:
        return self._oracle.encode(text)[0]

    def encode_capped(self, text: Optional[str], max_tokens: int) -> EncodingResult:
        tokens, truncated = self._oracle.encode(text, max_tokens)
        return EncodingResult(tokens, truncated)

    def encode_ordinary(self, text: Optional[str]) -> List[int]:
        return self._oracle.encode_ordinary(text)[0]

    def encode_ordinary_capped(
        self, text: Optional[str], max_tokens: int
    ) -> EncodingResult:
        tokens, truncated = self._oracle.encode_ordinary(text, max_tokens)
        return EncodingResult(tokens, truncated)

    def decode_bytes(self, tokens: Sequence[int]) -> bytes:
        return self._oracle.decode_bytes(tokens)

    @property
    def name(self) -> str:
        return self._params.name

    @property
    def special_tokens(self) -> Dict[str, int]:
        return dict(self._oracle.special_tokens)

    # -- batch: device-accelerated -------------------------------------

    def encode_ordinary_batch(
        self, texts: Sequence[Optional[str]]
    ) -> List[List[int]]:
        engine = self.device_engine()
        if engine is None:
            return [self.encode_ordinary(t) for t in texts]
        return engine.encode_ordinary_batch(texts)

    def encode_batch(self, texts: Sequence[Optional[str]]) -> List[List[int]]:
        for t in texts:
            if t is not None:
                self._oracle.check_special(t)
        return self.encode_ordinary_batch(texts)

    def count_tokens_batch(self, texts: Sequence[Optional[str]]) -> List[int]:
        engine = self.device_engine()
        if engine is None:
            return [len(self.encode(t)) for t in texts]
        for t in texts:
            if t is not None:
                self._oracle.check_special(t)
        return engine.count_tokens_batch(texts)
