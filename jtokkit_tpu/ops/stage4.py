"""Stage A v4: gather-minimal classify + boundaries + piece table.

Cost model measured on TPU v5e (see scripts/profile_slope.py): elementwise
VPU ops are ~free, associative scans cost ~1.1 ms per 1M int32, but every
random gather/scatter costs ~7-9 ns per OUTPUT element regardless of table
size, and ``searchsorted`` is ~90 ms per 1M queries. The previous stage A
(``ops/pipeline.stage_a``) spent ~220 ms/MB, almost all of it in positional
gathers and two searchsorteds. v4 reformulates the same semantics
(reference hot loop: ``M/GptBytePairEncoding.java:71-103``; pre-split
patterns ``M/EncodingFactory.java:63,105``) so that per 1 MB chunk there
remain only a few unavoidable gather-class ops:

1. mask compaction via :func:`masked_positions` (lane sort + scan repack,
   ~4.5 ms — replaces ``jnp.nonzero``'s ~10.5 ms cumsum+scatter lowering),
2. ONE packed row gather of all per-piece fields (w0, w1, doc end),
3. TWO packed row gathers for the word-table probes (whole-piece hits),
4. a small compaction + stable argsort for the miss list.

Everything else is elementwise or rides THREE fused tuple scans (two
forward, one reverse; the Pallas block-carry kernel in
:mod:`jtokkit_tpu.ops.pallas_scan` on TPU backends) whose leaves carry
every run-structure quantity the boundary rules need — no positional
gathers, no searchsorted, and for pure-ASCII chunks (host-detected) no
codepoint-table gather either: ASCII classes are computed arithmetically.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..engine.charclass import CRLF, LETTER, NUMBER, OTHER, PAD, SPACE, WS
from . import classify as classify_ops
from . import pallas_scan

_BOS = -1
_APO = 0x27
_ONE_CHAR = (ord("s"), ord("t"), ord("m"), ord("d"))
_TWO_CHAR = ((ord("r"), ord("e")), (ord("v"), ord("e")), (ord("l"), ord("l")))

_H1 = (0x9E3779B1, 0x85EBCA77, 0x2C1B3C6D)
_H2 = (0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)
_LEN_MIX = 0x01000193

# Profiling-only ablations (JTOKKIT_TPU_ABLATE=wordprobe,misspos,argsort,
# stitch): each replaces one gather-class sub-stage with a shape-identical
# stub so steady-state bench deltas attribute cost IN CONTEXT (the
# checkpoint profiler's per-prefix jits fuse differently and misattribute).
# Results are WRONG under ablation — never set outside profiling runs.
_ABLATE = frozenset(
    x for x in os.environ.get("JTOKKIT_TPU_ABLATE", "").split(",") if x
)

# overflow bits (meta[0]); the engine retries with the roomier variant on
# CAPACITY, and takes the host fallback only on PIECE_LEN
OVERFLOW_CAPACITY = 1   # piece table or miss table too small for this text
OVERFLOW_PIECE_LEN = 2  # a single piece exceeds the largest merge bucket

# Fine length buckets: merge round-1 cost is proportional to the bucket
# width x piece count, so occupancy matters; the 256/384 splits keep long
# CJK letter runs (~270-600 bytes) near-fully packed.
BUCKET_WIDTHS = (8, 16, 32, 64, 128, 256, 384, 512, 4096)
MAX_PIECE_LEN = BUCKET_WIDTHS[-1]
META_LEN = 2 + len(BUCKET_WIDTHS)


def _mix(u, v, consts, mask):
    a, b, c = (jnp.uint32(x) for x in consts)
    h = (u.astype(jnp.uint32) * a) ^ (v.astype(jnp.uint32) * b)
    h = h ^ (h >> 15)
    h = h * c
    h = h ^ (h >> 13)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def _shift_right(x, fill, k: int = 1):
    return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])


def _shift_left(x, fill, k: int = 1):
    return jnp.concatenate([x[k:], jnp.full((k,), fill, x.dtype)])


# ---------------------------------------------------------------------------
# fused tuple scans
# ---------------------------------------------------------------------------
# Per-leaf combines; each is associative, so a single associative_scan over
# the tuple computes every quantity in shared passes.

def _c_max(a, b):
    return jnp.maximum(a, b)


def _c_add(a, b):
    return a + b


def _c_lastnn(a, b):
    """Select-scan: the value >= 0 that is LATEST in scan order wins
    (-1 = unset). In a forward scan this propagates the nearest set value
    to the left; with ``reverse=True`` (which flips the array before
    scanning, so ``b`` is the LOWER index) it propagates the nearest set
    value to the right."""
    return jnp.where(b >= 0, b, a)


def classify_ascii(buf: jnp.ndarray, valid: jnp.ndarray) -> dict:
    """Arithmetic classifier for pure-ASCII chunks (no table gather).

    ASCII restrictions of the classes in :mod:`jtokkit_tpu.engine.charclass`:
    letters a-zA-Z, digits 0-9, CR/LF, space, and TAB/VT/FF (the only other
    ASCII White_Space codepoints). Every byte is its own character.
    """
    b = buf.astype(jnp.int32)
    lower = b | 32
    is_letter = (lower >= 0x61) & (lower <= 0x7A)
    is_digit = (b >= 0x30) & (b <= 0x39)
    is_crlf = (b == 0x0A) | (b == 0x0D)
    is_space = b == 0x20
    is_ws = (b == 0x09) | (b == 0x0B) | (b == 0x0C)
    cls = jnp.where(
        is_letter,
        LETTER,
        jnp.where(
            is_digit,
            NUMBER,
            jnp.where(
                is_crlf, CRLF, jnp.where(is_space, SPACE, jnp.where(is_ws, WS, OTHER))
            ),
        ),
    )
    cls = jnp.where(valid, cls, PAD).astype(jnp.int32)
    return {
        "cls": cls,
        "cls_start": cls,
        "is_start": valid,
        "char_len": jnp.ones_like(b),
        "byte": b,
    }


def piece_starts_v4(info: dict, pattern: str, *, ascii_chars: bool = False):
    """Piece-start mask + per-byte doc-end positions, gather-free.

    Same boundary semantics as :func:`jtokkit_tpu.ops.boundaries.piece_starts`
    (itself validated against the reference patterns on the conformance
    corpus), reformulated so every positional gather becomes a leaf of one of
    three fused tuple scans. Scan cost is proportional to total leaf width,
    so leaves sharing a mask are bit-packed and ``ascii_chars=True`` (every
    char is one byte) drops the char-ordinal and last-char-start leaves.

    Returns (mask bool[n], doc_end_pos int32[n]).
    """
    if pattern not in ("gpt2", "cl100k"):
        raise ValueError(f"unsupported device pattern {pattern!r}")
    is_cl = pattern == "cl100k"

    cls = info["cls"]
    start = info["is_start"]
    byte = info["byte"]
    n = cls.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    prev_cls = _shift_right(cls, _BOS)
    if ascii_chars:
        char_start_pos = idx
    else:
        s1 = _shift_right(start, False)
        s2 = _shift_right(s1, False)
        char_start_pos = jnp.where(
            start, idx, jnp.where(s1, idx - 1, jnp.where(s2, idx - 2, idx - 3))
        )

    is_ws = (cls >= WS) & (cls <= SPACE)
    is_crlf_b = cls == CRLF
    invalid = cls == PAD

    ws_run_start_b = is_ws & ~_shift_right(is_ws, False)
    digit_run_start = start & (cls == NUMBER) & (prev_cls != NUMBER)

    # ---- forward scan 1: whole-run prefixes independent of `absorbed` ------
    #   rsp+pro (packed, same mask): ws run-start position << 1 | whether the
    #     char before the run is OTHER — max picks the latest run start and
    #     carries its flag bit
    #   lnc: last non-CRLF byte position (cl100k CRLF-prefix absorption)
    #   cord: character ordinal (cumsum; only needed for multibyte digits)
    #   dro: digit-run start (in char ords, or byte idx when ascii)
    rsp_pro_leaf = jnp.where(
        ws_run_start_b,
        idx * 2 + (prev_cls == OTHER).astype(jnp.int32),
        -1,
    )
    leaves1 = [rsp_pro_leaf]
    kinds1 = ["max"]
    if is_cl:
        leaves1.append(jnp.where(~is_crlf_b, idx, -1))
        kinds1.append("max")
    if is_cl and not ascii_chars:
        leaves1.append(start.astype(jnp.int32))
        kinds1.append("add")
    if is_cl and ascii_chars:
        # 1 byte per char: digit-run position arithmetic works on byte idx
        leaves1.append(jnp.where(digit_run_start, idx, -1))
        kinds1.append("max")

    out1 = pallas_scan.scan_leaves(leaves1, kinds1)
    rsp_pro = out1[0]
    rsp = rsp_pro >> 1
    pro = rsp_pro & 1
    if is_cl:
        lnc = out1[1]
    if is_cl and not ascii_chars:
        char_ord = out1[2] - 1
    if is_cl and ascii_chars:
        dro = out1[2]

    if is_cl:
        in_crlf_prefix = is_crlf_b & (lnc < rsp)
        absorbed = in_crlf_prefix & (pro == 1)
        eff_ws = is_ws & ~absorbed
    else:
        eff_ws = is_ws

    eff_run_start_b = eff_ws & ~_shift_right(eff_ws, False)

    # ---- forward scan 2 (cl100k only): quantities depending on `absorbed` --
    if is_cl:
        leaves2 = [
            jnp.where(eff_run_start_b, idx, -1),
            jnp.where(is_crlf_b & eff_ws, idx, -1),
        ]
        if not ascii_chars:
            leaves2.append(jnp.where(digit_run_start, char_ord, -1))

        out2 = pallas_scan.scan_leaves(leaves2, ["max"] * len(leaves2))
        ers, lcp = out2[0], out2[1]
        if not ascii_chars:
            dro = out2[2]
    else:
        ers = rsp
        lcp = jnp.full_like(idx, -1)

    # ---- reverse scan 3: values defined at ws run-END bytes + doc ends -----
    run_end_b = is_ws & ~_shift_left(is_ws, False)
    next_cls = _shift_left(cls, PAD)
    # rep+nar share the run-end mask: pack (run_end_pos << 3 | next class)
    rep_nar_leaf = jnp.where(run_end_b, idx * 8 + next_cls, -1)
    leaves3 = [rep_nar_leaf, jnp.where(invalid, idx, -1)]
    if is_cl:
        leaves3.append(jnp.where(run_end_b, lcp + 1, -1))
    if not ascii_chars:
        leaves3.append(jnp.where(run_end_b, char_start_pos, -1))

    out3 = pallas_scan.scan_leaves(
        leaves3, ["last"] * len(leaves3), reverse=True
    )
    rep_nar, die = out3[0], out3[1]
    run_end_pos = rep_nar >> 3
    next_after_run = jnp.where(rep_nar >= 0, rep_nar & 7, -1)
    if is_cl:
        last_crlf_whole = out3[2] - 1
    last_char_start = run_end_pos if ascii_chars else out3[-1]
    doc_end_pos = jnp.where(die >= 0, die, n)
    if is_cl and ascii_chars:
        char_ord = idx  # only differences are used, within single-byte runs
    # `followed_by_nonws`: the (?!\S) lookahead fails, i.e. a non-whitespace
    # char follows the run. Shift fill = PAD covers end-of-buffer.
    followed_by_nonws = (next_after_run != PAD) & (next_after_run >= 0)

    # ---- whitespace piece starts & forward glue -----------------------------
    if is_cl:
        crlf_present = last_crlf_whole >= ers
        sub_start = jnp.where(crlf_present, last_crlf_whole + 1, ers)
        has_remainder = sub_start <= run_end_pos
        ws_piece_start = eff_ws & start & (
            (idx == ers)
            | (crlf_present & has_remainder & (idx == sub_start))
            | (followed_by_nonws & has_remainder & (idx == last_char_start)
               & (idx != sub_start))
        )
        glue_ok = jnp.where(
            next_after_run == LETTER,
            True,
            jnp.where(next_after_run == OTHER, byte == 0x20, False),
        )
        glue_fwd = (
            eff_ws & start & followed_by_nonws & has_remainder
            & (idx == last_char_start) & glue_ok
        )
    else:
        ws_piece_start = is_ws & start & (
            (idx == rsp)
            | (followed_by_nonws & (idx == last_char_start) & (idx != rsp))
        )
        glue_fwd = (
            is_ws & start & followed_by_nonws
            & (idx == last_char_start) & (byte == 0x20)
        )

    # glued_back[i] = glue_fwd at the previous char's start byte; UTF-8 chars
    # are <= 4 bytes, so a bounded shift-select replaces the gather.
    prev_char = _shift_right(char_start_pos, -1)
    glued_back = jnp.zeros_like(start)
    for k in (1, 2, 3, 4):
        glued_back = glued_back | (
            _shift_right(glue_fwd, False, k) & (prev_char == idx - k)
        )

    # ---- punctuation runs ---------------------------------------------------
    other_piece_start = start & (cls == OTHER) & (prev_cls != OTHER) & ~glued_back

    # ---- contractions -------------------------------------------------------
    b1 = _shift_left(byte, 0)
    b2 = _shift_left(byte, 0, 2)
    if is_cl:
        l1 = jnp.where((b1 >= 65) & (b1 <= 90), b1 + 32, b1)
        l2 = jnp.where((b2 >= 65) & (b2 <= 90), b2 + 32, b2)
        one = jnp.zeros_like(start)
        for c in _ONE_CHAR:
            one = one | (l1 == c)
        two = jnp.zeros_like(start)
        for c1, c2 in _TWO_CHAR:
            two = two | ((l1 == c1) & (l2 == c2))
        # U+017F LONG S folds to 's' under Java UNICODE_CASE (UTF-8 C5 BF)
        long_s = (b1 == 0xC5) & (b2 == 0xBF)
    else:
        one = jnp.zeros_like(start)
        for c in _ONE_CHAR:
            one = one | (b1 == c)
        two = jnp.zeros_like(start)
        for c1, c2 in _TWO_CHAR:
            two = two | ((b1 == c1) & (b2 == c2))
        long_s = jnp.zeros_like(start)

    apo_start = (byte == _APO) & other_piece_start
    contraction2 = apo_start & one
    contraction3 = apo_start & ~one & (two | long_s)
    contraction = contraction2 | contraction3

    suppress = _shift_right(contraction, False) | _shift_right(contraction3, False, 2)
    forced = _shift_right(contraction2, False, 2) | _shift_right(contraction3, False, 3)

    # ---- letter runs --------------------------------------------------------
    if is_cl:
        pre_flag = other_piece_start & ~contraction
        prev_is_prefix = jnp.zeros_like(start)
        for k in (1, 2, 3, 4):
            prev_is_prefix = prev_is_prefix | (
                _shift_right(pre_flag, False, k) & (prev_char == idx - k)
            )
        prev_is_prefix = prev_is_prefix & (prev_cls == OTHER)
        letter_glued = glued_back | prev_is_prefix
    else:
        letter_glued = glued_back
    letter_piece_start = start & (cls == LETTER) & (
        ((prev_cls != LETTER) & ~letter_glued) | forced
    )

    # ---- number runs --------------------------------------------------------
    if is_cl:
        pos_in_run = char_ord - dro
        number_piece_start = start & (cls == NUMBER) & (pos_in_run % 3 == 0)
    else:
        number_piece_start = start & (cls == NUMBER) & (
            (prev_cls != NUMBER) & ~glued_back
        )

    mask = jnp.where(
        is_ws,
        ws_piece_start,
        jnp.where(
            cls == LETTER,
            letter_piece_start,
            jnp.where(cls == NUMBER, number_piece_start, other_piece_start),
        ),
    )
    return mask & ~suppress & start, doc_end_pos


def masked_positions(mask, size: int, fill):
    """Ascending indices of True positions, padded with ``fill``.

    A drop-in replacement for ``jnp.nonzero(mask, size=size,
    fill_value=fill)[0]`` that avoids XLA's cumsum+scatter lowering
    (~10.5 ms per 1M mask bits on v5e). Measured costs of the pieces here:
    a 128-lane row sort is ~free, the scatter is Nr-sized (tiny), the
    cummax rides the Pallas scan kernel, and ONE gather over `size`
    elements stitches the rows — ~4.5 ms total at N=1M, size=N/4.

    How: compact each [128]-lane row by sorting (True positions carry their
    index, False carry N = sorts to the tail), then map every output slot p
    to its owning row r (the largest r with rowstart[r] <= p, propagated by
    a cummax over scattered row marks) and read rowdata[r, p - rowstart[r]].
    """
    N = mask.shape[0]
    n_rows = N // 128
    if N % 128 or n_rows < 8:
        return jnp.nonzero(mask, size=size, fill_value=fill)[0].astype(jnp.int32)
    m2 = mask.reshape(n_rows, 128)
    idx2 = jnp.arange(N, dtype=jnp.int32).reshape(n_rows, 128)
    rowdata = jnp.sort(jnp.where(m2, idx2, jnp.int32(N)), axis=1).reshape(-1)
    rowcount = m2.sum(axis=1).astype(jnp.int32)
    incl = jnp.cumsum(rowcount).astype(jnp.int32)  # tiny (n_rows)
    rowstart = incl - rowcount
    total = incl[n_rows - 1]

    r_iota = jnp.arange(n_rows, dtype=jnp.int32)
    marks_row = jnp.full((size,), -1, jnp.int32).at[rowstart].max(
        r_iota, mode="drop"
    )
    marks_off = jnp.full((size,), -1, jnp.int32).at[rowstart].max(
        rowstart, mode="drop"
    )
    row_of, off_of = pallas_scan.scan_leaves(
        [marks_row, marks_off], ["max", "max"]
    )
    p = jnp.arange(size, dtype=jnp.int32)
    flat_idx = jnp.clip(row_of * 128 + (p - off_of), 0, N - 1)
    out = jnp.take(rowdata, flat_idx, mode="clip")
    return jnp.where(p < total, out, jnp.int32(fill))


def masked_rows(mask, fields, size: int, fill):
    """Positions of True bits AND their field rows, in ONE stitch gather.

    Equivalent to ``pos = nonzero(mask)[0]; rows = fields[pos]`` but priced
    as a single [size, F+1] ROW gather instead of a scalar position gather
    followed by a second row gather: gather cost on this hardware is per
    ROW (~2.9 ns) rather than per element, so folding the position into the
    field row halves the stitch cost of stage A (measured in
    ``scripts/profile_stage_a_v4.py``).

    How: like :func:`masked_positions`, each 128-lane row is compacted by a
    lane sort — but a VARIADIC ``lax.sort`` carries the field columns along
    with the position key, so the stitched row gather reads (pos, fields...)
    together. Junk tail slots (key = N) may permute arbitrarily (the sort
    is not stable across equal keys); they are never consumed because the
    stitch maps output slot p < total into its owning row's live prefix.

    Args:
      mask: bool[N], N a multiple of 128 with >= 8 rows (else fallback).
      fields: int32[N, F] per-position payload (F small; 3 keeps the
        gathered row at the measured-optimal width 4).
      size: static output capacity.
      fill: position fill value for slots >= popcount(mask).

    Returns (pos int32[size], rows int32[size, F]); rows at dead slots are
    junk (callers mask by validity).
    """
    N = mask.shape[0]
    n_rows = N // 128
    F = fields.shape[1]
    if N % 128 or n_rows < 8:
        pos = jnp.nonzero(mask, size=size, fill_value=fill)[0].astype(
            jnp.int32
        )
        return pos, jnp.take(
            fields, jnp.clip(pos, 0, N - 1), axis=0, mode="clip"
        )
    m2 = mask.reshape(n_rows, 128)
    idx2 = jnp.arange(N, dtype=jnp.int32).reshape(n_rows, 128)
    keys = jnp.where(m2, idx2, jnp.int32(N))
    ops = [keys] + [
        fields[:, j].reshape(n_rows, 128) for j in range(F)
    ]
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    comb = jnp.stack([s.reshape(-1) for s in sorted_ops], axis=1)  # [N, F+1]

    rowcount = m2.sum(axis=1).astype(jnp.int32)
    incl = jnp.cumsum(rowcount).astype(jnp.int32)  # tiny (n_rows)
    rowstart = incl - rowcount
    total = incl[n_rows - 1]
    r_iota = jnp.arange(n_rows, dtype=jnp.int32)
    marks_row = jnp.full((size,), -1, jnp.int32).at[rowstart].max(
        r_iota, mode="drop"
    )
    marks_off = jnp.full((size,), -1, jnp.int32).at[rowstart].max(
        rowstart, mode="drop"
    )
    row_of, off_of = pallas_scan.scan_leaves(
        [marks_row, marks_off], ["max", "max"]
    )
    p = jnp.arange(size, dtype=jnp.int32)
    flat_idx = jnp.clip(row_of * 128 + (p - off_of), 0, N - 1)
    out = jnp.take(comb, flat_idx, axis=0, mode="clip")  # [size, F+1]
    pos = jnp.where(p < total, out[:, 0], jnp.int32(fill))
    return pos, out[:, 1:]


# Word-probe gather lowering (JTOKKIT_TPU_PROBE): end-to-end measurement on
# v5e shows gather cost is dominated by per-ROW overhead and depends on the
# index SHAPE the lowering sees, so the fastest variant is an empirical
# choice:
#   stack8  - ONE gather, [2, P] stacked index, 8-int rows     (0.478 s)
#   flat8x2 - TWO gathers, flat [P] indices, 8-int rows        (0.443 s)
#   flat4x2 - four flat gathers of narrow (4/1-wide) views     (0.568 s)
#   cat8    - ONE gather, concatenated flat [2P] index         (0.460 s)
#   split8x2- TWO gathers into the two SEPARATE cuckoo halves  <- default
# (32 MB english count-mode, same run, v5e). The decisive effect is TABLE
# ROW COUNT, not row width: random gathers cost ~2.9 ns/row for tables up
# to 2^17 rows and ~10.4 ns/row at 2^18 regardless of width (measured,
# scripts/profile_gather_rows.py protocol with tables as jit arguments).
# The stacked [2S, 8] table sits exactly at 2^18 rows, so every variant
# probing it pays the cliff; split8x2 probes each 2^17-row half directly.
_PROBE_VARIANT = os.environ.get("JTOKKIT_TPU_PROBE", "split8x2")


def _word_probe(word_rows_cat, word_mask, s1, s2, pw0, pw1, pw2, pw3,
                lens, short):
    """Exact whole-piece lookup: hit id or -1 per piece (reference direct
    hit, ``M/GptBytePairEncoding.java:81-83``)."""
    v = _PROBE_VARIANT

    def check(r, w3r=None):
        # r: [..., >=5] row slice per probe; w3r overrides column 3
        w3v = r[..., 3] if w3r is None else w3r
        lenid = r[..., 4] if w3r is None else r[..., 3]
        ok = (
            (r[..., 0] == pw0) & (r[..., 1] == pw1) & (r[..., 2] == pw2)
            & (w3v == pw3) & (lenid >> 20 == lens) & (lenid >= 0)
        )
        return jnp.where(ok, lenid & 0xFFFFF, -1)

    if isinstance(word_rows_cat, tuple):
        # the production layout: two separate 2^17-row half tables, passed
        # as jit ARGUMENTS — argument buffers gather ~2x faster than
        # closure constants on v5e, and separate buffers keep every
        # operand out of the 2^18-row lowering bad zone (in-program slices
        # of one stacked argument fused into the gathers and measured
        # SLOWER end-to-end; scripts/profile_gather_provenance.py)
        half0, half1 = word_rows_cat
        S = word_mask + 1
        h1 = check(jnp.take(half0, s1, axis=0, mode="clip"))
        h2 = check(jnp.take(half1, s2 - S, axis=0, mode="clip"))
    elif v == "split8x2":
        S = word_mask + 1
        h1 = check(jnp.take(word_rows_cat[:S], s1, axis=0, mode="clip"))
        h2 = check(jnp.take(word_rows_cat[S:], s2 - S, axis=0, mode="clip"))
    elif v == "flat8x2":
        h1 = check(jnp.take(word_rows_cat, s1, axis=0, mode="clip"))
        h2 = check(jnp.take(word_rows_cat, s2, axis=0, mode="clip"))
    elif v == "flat4x2":
        rows4 = jnp.concatenate(
            [word_rows_cat[:, :3], word_rows_cat[:, 4:5]], axis=1
        )
        w3col = word_rows_cat[:, 3]
        h1 = check(
            jnp.take(rows4, s1, axis=0, mode="clip"),
            jnp.take(w3col, s1, mode="clip"),
        )
        h2 = check(
            jnp.take(rows4, s2, axis=0, mode="clip"),
            jnp.take(w3col, s2, mode="clip"),
        )
    elif v == "cat8":
        s = jnp.concatenate([s1, s2])
        r = jnp.take(word_rows_cat, s, axis=0, mode="clip")
        P = s1.shape[0]
        h1, h2 = check(r[:P]), check(r[P:])
    else:  # stack8
        s = jnp.stack([s1, s2])
        r = jnp.take(word_rows_cat, s, axis=0, mode="clip")
        h1, h2 = check(r[0]), check(r[1])

    hit = jnp.where(h1 < 0, h2, h1)
    return jnp.where(short, hit, -1)


class PieceTableV4(NamedTuple):
    """Stage-A v4 output; all device-resident."""

    starts: jnp.ndarray        # int32[P]
    lens: jnp.ndarray          # int32[P]
    hit: jnp.ndarray           # int32[P] direct-hit token id or -1
    miss_sorted: jnp.ndarray   # int32[M] piece indices, grouped by bucket
    group_start: jnp.ndarray   # int32[len(BUCKET_WIDTHS)+1]
    n_pieces: jnp.ndarray      # int32 scalar
    bucket_counts: jnp.ndarray  # int32[len(BUCKET_WIDTHS)]
    overflow: jnp.ndarray      # int32 scalar (bit flags)


def doc_token_counts_v4(offsets, n_tokens, starts, doc_ends, n_pieces):
    """Per-document token counts from the piece-count prefix sums.

    Pieces are in stream order, so document k owns the contiguous piece
    range [searchsorted(starts, begin_k), searchsorted(starts, begin_{k+1})).
    Binary search runs over D (tiny) queries, NOT per byte or per piece —
    a per-byte doc-id scan leaf and a per-piece scatter-add both cost more.
    """
    D = doc_ends.shape[0]
    P = starts.shape[0]
    # doc k begins one past the previous doc's end (the separator byte)
    begins = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), doc_ends[: D - 1] + 1]
    )
    del n_tokens
    first_piece = jnp.searchsorted(starts, begins, side="left").astype(jnp.int32)
    first_piece = jnp.minimum(first_piece, jnp.minimum(n_pieces, P))
    bound = jnp.concatenate(
        [first_piece[1:], jnp.minimum(n_pieces, P)[None]]
    )
    return jnp.maximum(offsets[bound] - offsets[first_piece], 0)


def stage_a_v4(
    buf, doc_ends, class_table, pattern,
    word_rows_cat, word_mask,
    *, variant: str, piece_div: int, miss_div: int,
):
    """Classify → boundaries → piece table → word-table hits → miss groups.

    Args:
      buf: uint8[N] chunk bytes (documents joined by separator bytes).
      doc_ends: int32[D] end position per chunk-document, padded with the
        used length; separators sit at doc_ends[k] for k < D-1 where
        doc_ends[k] < doc_ends[D-1]. Validity is derived here — no host
        valid-mask upload.
      class_table: int8[0x110000] codepoint classes (unused for "ascii").
      variant: "ascii" (arithmetic classes) or "unicode" (table gather).
      piece_div / miss_div: capacity divisors (P = N // piece_div).

    Returns (PieceTableV4, meta int32[7]) with meta =
    [overflow_bits, n_pieces, bucket_counts x5].
    """
    N = buf.shape[0]
    D = doc_ends.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    P = N // piece_div
    M = N // miss_div

    used = doc_ends[D - 1]
    sep_pos = jnp.where(doc_ends[: D - 1] < used, doc_ends[: D - 1], N)
    is_sep = jnp.zeros((N,), jnp.bool_).at[sep_pos].set(True, mode="drop")
    valid = (idx < used) & ~is_sep

    if variant == "ascii":
        info = classify_ascii(buf, valid)
    else:
        info = classify_ops.classify_bytes(buf, class_table, valid)

    mask, doc_end_pos = piece_starts_v4(
        info, pattern, ascii_chars=(variant == "ascii")
    )

    n_pieces = mask.sum().astype(jnp.int32)
    p_iota = jnp.arange(P, dtype=jnp.int32)

    # per-byte packed fields; the piece positions AND their field rows come
    # out of ONE [P, 6] stitch gather (masked_rows) — folding what was a
    # scalar position stitch plus a second field row gather. Four packed
    # words cover the 16-byte direct-hit window.
    b32 = buf.astype(jnp.uint32)
    ext = jnp.concatenate([b32, jnp.zeros((15,), jnp.uint32)])

    def word_at(k):
        return (
            ext[k : N + k] | (ext[k + 1 : N + k + 1] << 8)
            | (ext[k + 2 : N + k + 2] << 16)
            | (ext[k + 3 : N + k + 3] << 24)
        ).astype(jnp.int32)

    fields = jnp.stack(
        [word_at(0), word_at(4), word_at(8), word_at(12), doc_end_pos],
        axis=1,
    )  # [N, 5]
    if "stitch" in _ABLATE:  # pragma: no cover - profiling only
        starts = jnp.minimum(p_iota * piece_div, N)
        frow = fields[jnp.minimum(starts, N - 1)]
    else:
        starts, frow = masked_rows(mask, fields, P, N)
    piece_valid = p_iota < jnp.minimum(n_pieces, P)
    pw0_raw, pw1_raw, pw2_raw, pw3_raw, dend = (
        frow[:, 0], frow[:, 1], frow[:, 2], frow[:, 3], frow[:, 4]
    )

    next_start = jnp.concatenate([starts[1:], jnp.full((1,), N, jnp.int32)])
    ends = jnp.minimum(next_start, dend)
    lens = jnp.where(piece_valid, ends - starts, 0).astype(jnp.int32)

    overflow = jnp.where(n_pieces > P, OVERFLOW_CAPACITY, 0)
    overflow = overflow | jnp.where(
        lens.max(initial=0) > MAX_PIECE_LEN, OVERFLOW_PIECE_LEN, 0
    )

    # word-table probe (whole tokens of 1..16 bytes — 99%+ of the vocab, so
    # nearly every whole-token piece skips the merge entirely, mirroring the
    # reference's direct hit, M/GptBytePairEncoding.java:81-83): mask the
    # padded words by length, hash; BOTH cuckoo probes ride ONE row gather
    # into the stacked [2T, 8] table. Hash mirrors vocab.tables.word_key.
    def lmask(lo):
        sh = (jnp.clip(lens - lo, 0, 4) * 8).astype(jnp.uint32)
        full = jnp.uint32(0xFFFFFFFF)
        return jnp.where(sh >= 32, full, (jnp.uint32(1) << sh) - 1)

    pw0 = (pw0_raw.astype(jnp.uint32) & lmask(0)).astype(jnp.int32)
    pw1 = (pw1_raw.astype(jnp.uint32) & lmask(4)).astype(jnp.int32)
    pw2 = (pw2_raw.astype(jnp.uint32) & lmask(8)).astype(jnp.int32)
    pw3 = (pw3_raw.astype(jnp.uint32) & lmask(12)).astype(jnp.int32)

    short = piece_valid & (lens >= 1) & (lens <= 16)
    hu = (
        pw0.astype(jnp.uint32)
        ^ (pw2.astype(jnp.uint32) * jnp.uint32(0x7FEB352D))
    ).astype(jnp.int32)
    hv = (
        pw1.astype(jnp.uint32)
        ^ (lens.astype(jnp.uint32) * jnp.uint32(_LEN_MIX))
        ^ (pw3.astype(jnp.uint32) * jnp.uint32(0x846CA68B))
    )
    s1 = _mix(hu, hv, _H1, word_mask)
    s2 = _mix(hu, hv, _H2, word_mask) + (word_mask + 1)
    if "wordprobe" in _ABLATE:  # pragma: no cover - profiling only
        hit = jnp.where(short & (s1 + s2 >= 0), 0, -1)
    else:
        hit = _word_probe(
            word_rows_cat, word_mask, s1, s2, pw0, pw1, pw2, pw3, lens,
            short,
        )

    # compact misses, grouped by length bucket (stable: stream order kept)
    miss = piece_valid & (hit < 0)
    n_miss = miss.sum().astype(jnp.int32)
    overflow = overflow | jnp.where(n_miss > M, OVERFLOW_CAPACITY, 0)
    if "misspos" in _ABLATE:  # pragma: no cover - profiling only
        miss_idx = jnp.minimum(jnp.arange(M, dtype=jnp.int32), P - 1)
    else:
        miss_idx = masked_positions(miss, M, P - 1)
    m_valid = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(n_miss, M)
    m_len = jnp.where(m_valid, lens[miss_idx], 0)
    # bucket index by length: elementwise compares (searchsorted is ~90 ms
    # per 1M queries on this hardware — never use it on big arrays)
    bucket_of = jnp.zeros_like(m_len)
    for w in BUCKET_WIDTHS[:-1]:
        bucket_of = bucket_of + (m_len > w).astype(jnp.int32)
    bucket_of = jnp.where(m_valid, bucket_of, len(BUCKET_WIDTHS))
    if "argsort" in _ABLATE:  # pragma: no cover - profiling only
        order = jnp.arange(M, dtype=jnp.int32)
    else:
        order = jnp.argsort(bucket_of, stable=True).astype(jnp.int32)
    miss_sorted = miss_idx[order]
    bucket_counts = jnp.bincount(
        jnp.minimum(bucket_of, len(BUCKET_WIDTHS)),
        length=len(BUCKET_WIDTHS) + 1,
    ).astype(jnp.int32)[: len(BUCKET_WIDTHS)]
    group_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bucket_counts).astype(jnp.int32)]
    )

    meta = jnp.concatenate(
        [overflow[None], n_pieces[None], bucket_counts]
    ).astype(jnp.int32)
    return PieceTableV4(
        starts, lens, hit, miss_sorted, group_start,
        n_pieces, bucket_counts, overflow,
    ), meta
