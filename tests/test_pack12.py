"""12-bit packed token fetch: steady-state protocol parity.

The honest-encode critical path ships ~2 B/token over the device→host
link; 90% of english cl100k ids are < 4094, so steady-state passes ship a
1.5 B/token 12-bit plane with an in-order escape side stream, chosen per
chunk from the plan-cached escape count. Every pass must reproduce the
oracle exactly, including chunks where the packed format is declined
(high escape rate) and escape-dense documents.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from jtokkit_tpu.engine.device import DeviceEngine  # noqa: E402
from jtokkit_tpu.engine.oracle import OracleEngine  # noqa: E402
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS  # noqa: E402
from jtokkit_tpu.vocab.loader import load_builtin_ranks  # noqa: E402


def test_pack12_steady_state_parity():
    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(
        d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
    )
    eng = DeviceEngine.from_oracle(orc)
    docs = [
        # low-escape chunk: common words -> 12-bit plane chosen
        "the quick brown fox and the lazy dog jumps over it. " * 120,
        # escape-dense: rare words, unicode, digits (ids >= 4094 and >= 2^16)
        "Zyzzyva quixotic 😀 unfathomable „curly” 98765 " * 40,
        # id 4094 boundary neighborhood: every id is representable exactly
        "",
        "short tail",
    ]
    plan = eng.preload_corpus(docs)
    a1 = eng.encode_ordinary_batch_arrays(docs, plan=plan)
    assert plan.esc_counts is not None and len(plan.esc_counts) >= 1
    a2 = eng.encode_ordinary_batch_arrays(None, plan=plan)
    a3 = eng.encode_ordinary_batch_arrays(None, plan=plan)
    for i, t in enumerate(docs):
        exp = orc.encode_ordinary(t)[0]
        assert a1[i].tolist() == exp, f"cold pass doc {i}"
        assert a2[i].tolist() == exp, f"first steady pass doc {i}"
        assert a3[i].tolist() == exp, f"second steady pass doc {i}"


def test_consume_fetch_escape_roundtrip():
    """Direct unit check of the pack/unpack pair on a synthetic id mix."""
    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(
        d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
    )
    eng = DeviceEngine.from_oracle(orc)
    rng = np.random.RandomState(3)
    n = 5000
    ids = rng.randint(0, 100256, size=n).astype(np.int32)
    ids[: n // 2] = rng.randint(0, 4094, size=n // 2)  # mostly direct codes
    ids[10] = 4094
    ids[11] = 4093
    ids[12] = 99999
    pad = 8192
    buf = np.zeros(pad, np.int32)
    buf[:n] = ids
    ec = int((ids >= 4094).sum())
    ecap = 1 << (max(ec, 1024) - 1).bit_length()
    plane, lo, hi = eng._pack12(pad, ecap)(jnp.asarray(buf))
    out = eng._consume_fetch(("p12", pad, ec, plane, lo, hi), n)
    assert out.tolist() == ids.tolist()
