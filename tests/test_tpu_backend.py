"""Real-TPU-backend tests (subprocess; skipped when no TPU is attached).

The rest of the suite forces ``jax_platforms=cpu`` (tests/conftest.py), so
every "device" test exercises the CPU + Pallas-interpret path only. That
gap is exactly where round 4's sharded-on-TPU crash hid (``pallas_call``
under ``shard_map`` demands a ``vma`` on its out ShapeDtypeStructs on the
TPU lowering but not in interpret mode). These tests run the library in a
fresh subprocess with the platform UNforced, on whatever real accelerator
the environment exposes, and assert oracle parity there.

Reference analog: the conformance corpus is the arbiter everywhere
(``T/reference/Cl100kBaseTestTest.java:21-29``); here it arbitrates the
TPU lowering specifically.
"""

import json
import os
import subprocess
import sys

import pytest

_PROBE = (
    "import jax,sys;"
    "sys.exit(0 if jax.devices()[0].platform not in ('cpu',) else 3)"
)


def _tpu_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS",):
        env.pop(k, None)
    # the suite's small-chunk override would change compiled shapes; the
    # TPU subprocess uses production defaults
    env.pop("JTOKKIT_TPU_CHUNK", None)
    env.pop("XLA_FLAGS", None)
    return env


def _have_tpu() -> bool:
    try:
        return subprocess.run(
            [sys.executable, "-c", _PROBE], env=_tpu_env(),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=120,
        ).returncode == 0
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_tpu(), reason="no non-CPU jax backend attached"
)

_PARITY_SCRIPT = r"""
import json, sys
from jtokkit_tpu.bench import _oracle, _device_engine
from jtokkit_tpu.parallel.mesh import data_mesh
from jtokkit_tpu.parallel.sharded import ShardedTokenizer
from jtokkit_tpu.utils.corpus import generate
import jax

assert jax.devices()[0].platform != "cpu", jax.devices()
orc = _oracle("cl100k_base")
eng = _device_engine("cl100k_base")

docs = generate(1.0, seed=7, flavor="mixed")
want = [orc.encode_ordinary(t)[0] for t in docs]

got = eng.encode_ordinary_batch(docs)
assert got == want, "device engine TPU parity failed"

tok = ShardedTokenizer(eng, data_mesh())
got_sh = tok.encode_ordinary_batch(docs)
assert got_sh == want, "sharded engine TPU parity failed"
assert tok.count_tokens_corpus(docs) == sum(len(t) for t in want)
print(json.dumps({"docs": len(docs), "tokens": sum(len(t) for t in want)}))
"""


def test_tpu_device_and_sharded_parity():
    """Full pipeline (device engine + 1-wide sharded mesh) vs the oracle on
    the real backend — the round-4 crash class regression test."""
    r = subprocess.run(
        [sys.executable, "-c", _PARITY_SCRIPT], env=_tpu_env(),
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, f"stdout={r.stdout[-2000:]}\nstderr={r.stderr[-4000:]}"
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["tokens"] > 0
