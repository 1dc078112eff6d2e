"""Multi-process (2 "hosts") dryrun of the distributed path.

The reference is single-process (SURVEY §5: no distributed backend), so this
covers the TPU-native build target instead: ``initialize_distributed`` +
a global 2-process mesh + the sharded count with its psum reduction. Runs
on CPU: each child process contributes 4 virtual devices to an 8-device
global mesh. Fails if multi-process init, global device_put, shard_map
partitioning, or the psum collective breaks.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
import numpy as np
port, pid = sys.argv[1], int(sys.argv[2])

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from jtokkit_tpu.parallel.mesh import initialize_distributed
initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

from jax.sharding import Mesh
from jtokkit_tpu.engine.device import DeviceEngine
from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.parallel.mesh import DATA_AXIS
from jtokkit_tpu.parallel.sharded import ShardedTokenizer
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import load_builtin_ranks

d = BUILTIN_DEFINITIONS["cl100k_base"]
orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name),
                   d.special_tokens)
eng = DeviceEngine.from_oracle(orc)
mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
tok = ShardedTokenizer(eng, mesh)

texts = [f"process-global doc {i}: some text to tokenize across hosts. "
         * (1 + i % 3) for i in range(16)] + ["日本語テキスト " * 8]
total = tok.count_tokens_corpus(texts)
expect = [orc.encode_ordinary(t)[0] for t in texts]
assert total == sum(len(e) for e in expect), (total, "count mismatch")
print(f"proc {pid}: psum count ok ({total})", flush=True)

# encode across processes: exercises the process_allgather token fetch
got = tok.encode_ordinary_batch(texts)
assert got == expect, "multi-process sharded encode diverged from oracle"
print(f"proc {pid}: allgather encode ok", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# no pytest-timeout plugin in this environment; the hard guard is the
# communicate(timeout=560) below, which kills a hung child deterministically
def test_two_process_distributed_count():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device counts
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU plugin in children
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact child PIDs we started, never by pattern
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "psum count ok" in out, out[-3000:]
        assert "allgather encode ok" in out, out[-3000:]
