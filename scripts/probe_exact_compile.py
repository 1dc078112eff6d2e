"""Standalone compile/run timing of the wide-bucket hybrid merge.

Explicit jit.lower().compile() wall-clock per (lanes, cap), then
steady-state run time on CJK-shaped data (letter runs of 3-byte chars).

Usage: python scripts/probe_exact_compile.py [lanes] [cap]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(lanes=256, cap=512):
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.ops import merge_exact
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name),
                       d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)
    print(f"lanes={lanes} cap={cap} chain={merge_exact.phase_chain(lanes)}",
          flush=True)

    # CJK-shaped synthetic bucket: pieces of ~0.7*lanes bytes of 3-byte chars
    rng = np.random.RandomState(0)
    N = 1 << 20
    text = "".join(chr(0x4E00 + rng.randint(0, 500)) for _ in range(lanes))
    pb = text.encode("utf-8")[: lanes - 2]
    n_pieces = cap - 8
    buf = np.zeros(N, np.uint8)
    starts = np.zeros(cap, np.int32)
    lens = np.zeros(cap, np.int32)
    pos = 0
    for i in range(n_pieces):
        ln = rng.randint(lanes // 2, len(pb))
        buf[pos : pos + ln] = np.frombuffer(pb[:ln], np.uint8)
        starts[i] = pos
        lens[i] = ln
        pos += ln + 1
        if pos + lanes >= N:
            n_pieces = i + 1
            break
    miss_sorted = np.arange(cap, dtype=np.int32) % max(n_pieces, 1)
    miss_sorted[:n_pieces] = np.arange(n_pieces)

    def fn(buf_d, st, ln, ms):
        cols, outs = merge_exact.merge_bucket_exact(
            buf_d, st, ln, ms, jnp.int32(0), jnp.int32(n_pieces),
            eng._byte_to_id, eng._byte_pair_seed,
            eng._pair_rows_cat, eng.packed.table_mask,
            lanes=lanes, cap=cap,
        )
        return sum((ids * act).sum() + act.sum() for ids, act in outs)

    args = (jnp.asarray(buf), jnp.asarray(starts), jnp.asarray(lens),
            jnp.asarray(miss_sorted))
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jfn.lower(*args)
    t1 = time.perf_counter()
    print(f"trace+lower: {t1-t0:.1f} s", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"compile: {t2-t1:.1f} s", flush=True)
    out = np.asarray(compiled(*args))
    t3 = time.perf_counter()
    print(f"first run: {t3-t2:.1f} s (out={out})", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    total_bytes = int(lens[:n_pieces].sum())
    print(f"steady run: {best*1e3:.1f} ms for {total_bytes} piece bytes "
          f"({total_bytes/best/1e6:.2f} MB/s merge-only)", flush=True)


if __name__ == "__main__":
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(lanes, cap)
