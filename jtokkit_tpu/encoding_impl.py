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
        self._native_engine = None
        self._native_tried = False
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

    def native_engine(self):
        """The C++ host engine (built on first use; None if unavailable).

        Only built-in pre-split families are implemented natively; custom
        regex patterns stay on the Python oracle.
        """
        if not self._native_tried:
            with self._device_lock:
                if not self._native_tried:
                    self._native_tried = True
                    complete_bytes = all(
                        bytes([b]) in self._params.encoder for b in range(256)
                    )
                    if self._params.pattern in BUILTIN_PATTERNS and complete_bytes:
                        try:
                            from .native import NativeEngine
                            from .vocab.tables import load_packed
                            from .vocab.loader import asset_path

                            try:
                                path = asset_path(self._params.name)
                            except Exception:
                                path = None
                            packed = load_packed(
                                self._params.name, self._params.encoder, path
                            )
                            self._native_engine = NativeEngine(
                                packed, self._params.pattern
                            )
                        except Exception as e:
                            # degrading to the Python oracle is a ~100x
                            # single-text slowdown — make it visible
                            import warnings

                            warnings.warn(
                                "jtokkit_tpu: native host engine unavailable"
                                f" ({e!r}); single-text calls fall back to"
                                " the Python oracle",
                                RuntimeWarning,
                                stacklevel=2,
                            )
                            self._native_engine = None
        return self._native_engine

    # -- Encoding contract ---------------------------------------------

    def encode(self, text: Optional[str]) -> List[int]:
        if text is None:
            return []
        self._oracle.check_special(text)
        return self.encode_ordinary(text)

    def encode_capped(self, text: Optional[str], max_tokens: int) -> EncodingResult:
        if text is None:
            return EncodingResult([], False)
        self._oracle.check_special(text)
        return self.encode_ordinary_capped(text, max_tokens)

    def encode_ordinary(self, text: Optional[str]) -> List[int]:
        if text is None:
            return []
        native = self.native_engine()
        if native is not None:
            return native.encode_ordinary(text)
        return self._oracle.encode_ordinary(text)[0]

    def encode_ordinary_capped(
        self, text: Optional[str], max_tokens: int
    ) -> EncodingResult:
        if text is None:
            return EncodingResult([], False)
        native = self.native_engine()
        if native is not None:
            # the capped result is the first max_tokens tokens of the full
            # encoding, with the multibyte repair applied (the reference's
            # early-exit loop and clipping produce exactly this prefix,
            # M/GptBytePairEncoding.java:79-100,110-119); the native scan
            # early-exits, so this is O(prefix), not O(len(text))
            prefix = native.encode_ordinary_capped_array(text, max_tokens)
            if prefix is None:  # stale library without the capped ABI
                prefix = native.encode_ordinary(text)[:max_tokens]
            else:
                prefix = prefix.tolist()
            tokens, truncated = self._oracle._repair_truncation(text, prefix)
            return EncodingResult(tokens, truncated)
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

    def decode_bytes_batch(self, token_lists) -> List[bytes]:
        engine = self.device_engine()
        if engine is None:
            return [self.decode_bytes(t) for t in token_lists]
        return engine.decode_bytes_batch(token_lists)
