"""Substring-rank Pallas merge kernel (ops/submerge): bit-exactness.

Differential against the host oracle's merge loop (the conformance-proven
reference semantics, ``M/GptBytePairEncoding.java:200-275``) on adversarial
piece sets, in Pallas interpret mode on the CPU backend; plus an
engine-level end-to-end with the kernel forced on.
"""

import os
import random

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from jtokkit_tpu.engine.oracle import OracleEngine, byte_pair_merge  # noqa: E402
from jtokkit_tpu.ops import submerge  # noqa: E402
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS  # noqa: E402
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks  # noqa: E402
from jtokkit_tpu.vocab.tables import load_packed  # noqa: E402


@pytest.fixture(scope="module")
def cl100k():
    d = BUILTIN_DEFINITIONS["cl100k_base"]
    ranks = load_builtin_ranks(d.vocab_name)
    packed = load_packed(d.vocab_name, ranks, asset_path(d.vocab_name))
    word_lenid = np.where(
        packed.word_len < 0, -1, (packed.word_len << 20) | packed.word_id
    ).astype(np.int32)
    z = np.zeros_like(packed.word_w0[0])
    word_rows_cat = jnp.asarray(np.concatenate([
        np.stack([packed.word_w0[t], packed.word_w1[t], packed.word_w2[t],
                  packed.word_w3[t], word_lenid[t], z, z, z], axis=1)
        for t in (0, 1)
    ], axis=0))
    return ranks, packed, word_rows_cat


def _pieces(rng, n, max_len):
    out = [b" the", b" of", b"ing", b"Hello", b"'s", b"  ", b"\n", b"12",
           b"\xe6\x97\xa5\xe6\x9c\xac", b" \xc3\xa9t\xc3\xa9", b"!!",
           b"abcdefghijklmnop", b" understanding", b"\x00\x00\x01"]
    for _ in range(n):
        ln = rng.randint(1, max_len)
        kind = rng.random()
        if kind < 0.4:
            p = bytes(rng.choice(b"abcdefghijklmnopqrstuvwxyz ETAOIN")
                      for _ in range(ln))
        elif kind < 0.7:
            p = bytes(rng.randrange(256) for _ in range(ln))
        else:
            p = ("日本語あいabc123" * 3).encode()[:ln]
        out.append(p)
    return [p[:max_len] for p in out]


@pytest.mark.parametrize("W", [8, 16])
def test_kernel_matches_oracle(cl100k, W):
    ranks, packed, word_rows_cat = cl100k
    rng = random.Random(7)
    sel = [p for p in _pieces(rng, 150, W) if len(p) <= W]
    cap = ((len(sel) + 127) // 128) * 128
    mat = np.zeros((W, cap), np.uint8)
    lens = np.zeros((cap,), np.int32)
    for i, p in enumerate(sel):
        mat[: len(p), i] = np.frombuffer(p, np.uint8)
        lens[i] = len(p)
    rq = submerge.substring_ranks(
        jnp.asarray(mat), jnp.asarray(lens), word_rows_cat, packed.word_mask
    )
    bid = jnp.take(
        jnp.asarray(packed.byte_to_id), jnp.asarray(mat).astype(jnp.int32)
    )
    ids, act = submerge._submerge_call(
        rq, bid, jnp.asarray(lens), W=W, interpret=True
    )
    ids = np.asarray(ids)
    act = np.asarray(act) > 0
    for i, p in enumerate(sel):
        got = ids[:, i][act[:, i]].tolist()
        r = ranks.get(p)
        exp = [r] if r is not None else byte_pair_merge(p, ranks)
        assert got == exp, f"W={W} piece {p!r}: {got} != {exp}"


def test_engine_with_submerge_forced(monkeypatch):
    """End-to-end engine parity with the Pallas bucket merge forced on
    (interpret mode on non-TPU backends)."""
    monkeypatch.setenv("JTOKKIT_TPU_SUBMERGE", "16")
    from jtokkit_tpu.engine.device import DeviceEngine

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(
        d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
    )
    eng = DeviceEngine.from_oracle(orc)
    assert eng._submerge_max == 16
    docs = [
        "Hello world, unbelievable tokenization quirks!  " * 6,
        "Counterintuitively, 'twasn't    extraordinary\n\n12345 times.",
        "misc: qzxv jjkw plmb wrt 99 @@ ##",
    ]
    got = eng.encode_ordinary_batch(docs)
    for t, g in zip(docs, got):
        assert g == orc.encode_ordinary(t)[0]
