"""Round-3: measure the merge-engine crossover on the real TPU.

For each corpus flavor, time count_tokens_corpus with the exact batched
merge enabled for buckets >= threshold lanes. threshold=0 -> all exact
(round-2 state), huge -> all sequential (round-1 state).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(threshold, flavor, mb=8.0):
    os.environ["JTOKKIT_TPU_EXACT_MIN_LANES"] = str(threshold)
    # fresh engine per setting (jit caches are keyed per engine instance)
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.utils.corpus import generate
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name),
                       d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)
    docs = generate(mb, seed=0, flavor=flavor)
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    plan = eng.preload_corpus(docs)
    total = eng.count_tokens_corpus(docs, plan=plan)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        got = eng.count_tokens_corpus(docs, plan=plan)
        best = min(best, time.time() - t0)
        assert got == total
    mbps = nbytes / best / 1e6
    print(f"thr={threshold:>6} flavor={flavor:<8} {mbps:8.2f} MB/s "
          f"({best:.3f}s, {total} tokens)", flush=True)
    return mbps


if __name__ == "__main__":
    thr = int(sys.argv[1])
    for flavor in sys.argv[2].split(","):
        run_one(thr, flavor)
