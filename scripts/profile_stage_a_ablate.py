"""In-context stage-A cost attribution by ablation.

Runs the steady-state count pipeline (plan-cached, zero mid-pass syncs)
with each JTOKKIT_TPU_ABLATE stub enabled in a SUBPROCESS, and reports the
throughput delta vs the unablated run — the honest in-context cost of each
gather-class sub-stage (the checkpoint profiler's per-prefix jits fuse
differently and misattribute).

Usage: python scripts/profile_stage_a_ablate.py [mb] [flavor]
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %(root)r)
import numpy as np
from jtokkit_tpu.engine.device import DeviceEngine
from jtokkit_tpu.engine.oracle import OracleEngine
from jtokkit_tpu.utils.corpus import generate
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import load_builtin_ranks

d = BUILTIN_DEFINITIONS["cl100k_base"]
orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name),
                   d.special_tokens)
eng = DeviceEngine.from_oracle(orc)
docs = generate(%(mb)f, seed=0, flavor=%(flavor)r)
nbytes = sum(len(t.encode("utf-8")) for t in docs)
plan = eng.preload_corpus(docs)
eng.count_tokens_corpus(docs, plan=plan)  # warm + fill plan cache
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    eng.count_tokens_corpus(None, plan=plan)
    best = min(best, time.perf_counter() - t0)
print("RESULT", best, nbytes / best / 1e6)
"""


def run_one(ablate: str, mb: float, flavor: str) -> tuple:
    env = dict(os.environ)
    if ablate:
        env["JTOKKIT_TPU_ABLATE"] = ablate
    out = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"root": ROOT, "mb": mb, "flavor": flavor}],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, sec, mbps = line.split()
            return float(sec), float(mbps)
    raise RuntimeError(f"ablate={ablate!r} failed:\n{out.stderr[-2000:]}")


def main(mb=16.0, flavor="english"):
    base_sec, base_mbps = run_one("", mb, flavor)
    print(f"base       : {base_sec*1e3:8.1f} ms  {base_mbps:6.1f} MB/s",
          flush=True)
    for ab in ("wordprobe", "misspos", "argsort", "stitch",
               "misspos,argsort", "wordprobe,misspos,argsort,stitch"):
        sec, mbps = run_one(ab, mb, flavor)
        saved = (base_sec - sec) * 1e3 / mb
        print(f"-{ab:34s}: {sec*1e3:8.1f} ms  {mbps:6.1f} MB/s "
              f"(saves {saved:5.2f} ms/MB)", flush=True)


if __name__ == "__main__":
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    flavor = sys.argv[2] if len(sys.argv) > 2 else "english"
    main(mb, flavor)
