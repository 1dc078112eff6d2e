"""Vectorized UTF-8 decode + character classification on device.

Replaces HOT LOOP 1's character classing (reference
``M/GptBytePairEncoding.java:77-88`` iterates a Java regex over the text;
here every byte is classified in parallel):

- decode the codepoint starting at each lead byte with shifted-mask
  arithmetic (pure VPU ops),
- gather its class from the flat 0x110000-entry table built by
  :mod:`jtokkit_tpu.engine.charclass`,
- propagate the class to continuation bytes so later boundary logic can
  read "class of the character containing byte i" / "class of the previous
  character" with plain shifts.

Inputs are assumed to be valid UTF-8 (they come from encoding Python
strings); continuation-byte positions carry propagated values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import charclass

# Class codes (match engine.charclass)
OTHER = charclass.OTHER
LETTER = charclass.LETTER
NUMBER = charclass.NUMBER
WS = charclass.WS
CRLF = charclass.CRLF
SPACE = charclass.SPACE
PAD = charclass.PAD


def class_table_array() -> np.ndarray:
    """The int8 codepoint→class table (host; push to device once)."""
    return charclass.class_table()


# Classes are 3 bits; packing 10 per int32 keeps the table at 111,412 rows,
# under the measured ~2^17-row gather cliff (random gathers cost ~2.9 ns/row
# below it and ~10.4 ns/row at 2^18 rows regardless of row width — the flat
# 0x110000-entry int8 table paid the slow rate on every byte of unicode
# chunks, ~8 ms/MB of CJK stage A).
_PACK_PER_WORD = 10


def packed_class_table_array() -> np.ndarray:
    """The codepoint→class table packed 10 classes per int32 row."""
    t = charclass.class_table().astype(np.int64)
    n = t.shape[0]
    rows = -(-n // _PACK_PER_WORD)
    padded = np.zeros(rows * _PACK_PER_WORD, np.int64)
    padded[:n] = t
    packed = np.zeros(rows, np.int64)
    for k in range(_PACK_PER_WORD):
        packed |= padded[k::_PACK_PER_WORD] << (3 * k)
    return packed.astype(np.int32)


def _class_lookup(class_table: jnp.ndarray, cp: jnp.ndarray) -> jnp.ndarray:
    """Class of each (clipped) codepoint; accepts the flat int8 table or
    the packed int32 table (distinguished by dtype)."""
    if class_table.dtype == jnp.int8:
        return jnp.take(class_table, cp, mode="clip").astype(jnp.int32)
    w = jnp.take(class_table, cp // _PACK_PER_WORD, mode="clip")
    sh = (cp % _PACK_PER_WORD) * 3
    return (w >> sh) & 7


def decode_utf8(data: jnp.ndarray):
    """Per-byte UTF-8 structure.

    Args:
      data: uint8[n] byte stream.

    Returns:
      (codepoint int32[n], is_start bool[n], char_len int32[n]) —
      valid at lead-byte positions; arbitrary at continuation positions.
    """
    b0 = data.astype(jnp.int32)
    n = data.shape[0]
    # shifted next bytes (zero-padded at the end)
    z = jnp.zeros((3,), dtype=jnp.int32)
    ext = jnp.concatenate([b0, z])
    b1 = jax.lax.dynamic_slice_in_dim(ext, 1, n)
    b2 = jax.lax.dynamic_slice_in_dim(ext, 2, n)
    b3 = jax.lax.dynamic_slice_in_dim(ext, 3, n)

    is_cont = (b0 & 0xC0) == 0x80
    is_start = ~is_cont

    len1 = b0 < 0x80
    len2 = (b0 & 0xE0) == 0xC0
    len3 = (b0 & 0xF0) == 0xE0
    char_len = jnp.where(len1, 1, jnp.where(len2, 2, jnp.where(len3, 3, 4)))

    cp1 = b0
    cp2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = (
        ((b0 & 0x07) << 18)
        | ((b1 & 0x3F) << 12)
        | ((b2 & 0x3F) << 6)
        | (b3 & 0x3F)
    )
    cp = jnp.where(len1, cp1, jnp.where(len2, cp2, jnp.where(len3, cp3, cp4)))
    return cp, is_start, char_len


def classify_bytes(data: jnp.ndarray, class_table: jnp.ndarray, n_valid=None):
    """Per-byte char structure with classes propagated to continuations.

    Args:
      data: uint8[n] byte stream (zero-padded past ``n_valid``).
      class_table: int8[0x110000] codepoint→class (device-resident).
      n_valid: number of valid bytes (traced scalar); bytes at or past this
        index get class PAD and are never char starts.

    Returns dict of int32[n]/bool[n] arrays:
      cls        — class of the character containing each byte (PAD past end)
      is_start   — lead-byte mask (False past end)
      char_len   — length of the char starting here (lead bytes only)
      byte       — the raw byte (for ASCII-only equality checks)
    """
    cp, is_start, char_len = decode_utf8(data)
    cp_clipped = jnp.clip(cp, 0, charclass.MAX_CODEPOINT - 1)
    cls_start = _class_lookup(class_table, cp_clipped)

    n = data.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    if n_valid is not None:
        # n_valid may be a scalar count, or a bool[n] validity mask (False at
        # document-separator bytes, which then behave as hard piece breaks:
        # class PAD isolates runs, blocks gluing, and acts as EOS/BOS).
        n_valid = jnp.asarray(n_valid)
        valid = n_valid if n_valid.ndim == 1 else idx < n_valid
        is_start = is_start & valid
        cls_start = jnp.where(valid, cls_start, PAD)

    # propagate lead-byte class to continuation bytes: a UTF-8 char is at
    # most 4 bytes, so a bounded select over 3 shifted copies replaces a
    # full prefix scan (scans are the expensive primitive on TPU)
    def shift_r(x, k, fill):
        return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])

    s1 = shift_r(is_start, 1, False)
    s2 = shift_r(is_start, 2, False)
    c1 = shift_r(cls_start, 1, PAD)
    c2 = shift_r(cls_start, 2, PAD)
    c3 = shift_r(cls_start, 3, PAD)
    cls = jnp.where(
        is_start, cls_start, jnp.where(s1, c1, jnp.where(s2, c2, c3))
    )
    if n_valid is not None:
        cls = jnp.where(valid, cls, PAD)

    return {
        "cls": cls.astype(jnp.int32),
        "cls_start": cls_start,
        "is_start": is_start,
        "char_len": char_len,
        "byte": data.astype(jnp.int32),
    }
