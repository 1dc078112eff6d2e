"""Throughput benchmark, mirroring the reference's protocol.

The reference preloads a 265 MB Gutenberg corpus into RAM and measures
full-corpus encode passes (reference ``benchmark/README.md:9-11``,
``benchmark/.../AbstractBenchmark.java:26-38``). Here the corpus is a
deterministic synthetic Gutenberg-like corpus (the books are not shipped in
the reference repo either — its ``benchmark/data`` is empty), preloaded on
the host, and encode/count passes run through the device engine. Reported
throughput = corpus UTF-8 bytes / wall-clock seconds, steady-state (after
one warm-up pass that also triggers compilation).

Baseline for comparison: JTokkit cl100k_base single-thread ≈ 18.7 MB/s
(reference ``benchmark/reports/jtokkit.txt:26``: 14.144 s for 265 MB/pass on
a Ryzen 9 5900X).
"""

from __future__ import annotations

import time
from typing import Optional

BASELINE_MBPS = {
    # 265 MB / single-thread JMH score (reference benchmark/reports/jtokkit.txt)
    "cl100k_base": 265.0 / 14.144,
    "r50k_base": 265.0 / 12.263,
    "p50k_base": 265.0 / 12.800,
    "p50k_edit": 265.0 / 13.404,
}


def _load_corpus(mb: float, corpus: Optional[str], flavor: str):
    if corpus:
        with open(corpus, "r", encoding="utf-8") as f:
            text = f.read()
        # split into ~64KB docs on line boundaries
        docs, cur, size = [], [], 0
        for line in text.splitlines(keepends=True):
            cur.append(line)
            size += len(line)
            if size >= 64 * 1024:
                docs.append("".join(cur))
                cur, size = [], 0
        if cur:
            docs.append("".join(cur))
        return docs
    from .utils.corpus import generate

    return generate(mb, seed=0, flavor=flavor)


def run(
    mb: float = 16,
    encoding: str = "cl100k_base",
    mode: str = "device",
    corpus: Optional[str] = None,
    flavor: str = "english",
    passes: int = 3,
    verify: bool = True,
) -> dict:
    from .engine.device import DeviceEngine
    from .engine.oracle import OracleEngine
    from .vocab.definitions import BUILTIN_DEFINITIONS
    from .vocab.loader import load_builtin_ranks

    d = BUILTIN_DEFINITIONS[encoding]
    orc = OracleEngine(
        d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens
    )

    docs = _load_corpus(mb, corpus, flavor)
    nbytes = sum(len(t.encode("utf-8")) for t in docs)

    if mode == "host":
        t0 = time.time()
        total = sum(len(orc.encode_ordinary(t)[0]) for t in docs)
        elapsed = time.time() - t0
    else:
        eng = DeviceEngine.from_oracle(orc)
        total = eng.count_tokens_corpus(docs)  # warm-up + compile
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            got = eng.count_tokens_corpus(docs)
            best = min(best, time.time() - t0)
            assert got == total
        elapsed = best
        if verify:
            import random

            rng = random.Random(0)
            sample = rng.sample(range(len(docs)), min(3, len(docs)))
            enc_out = eng.encode_ordinary_batch([docs[i] for i in sample])
            for k, i in enumerate(sample):
                assert enc_out[k] == orc.encode_ordinary(docs[i])[0], (
                    f"parity failure on doc {i}"
                )

    mbps = nbytes / elapsed / 1e6
    baseline = BASELINE_MBPS.get(encoding, BASELINE_MBPS["cl100k_base"])
    return {
        "metric": f"{encoding} encode throughput ({mode}, 1 chip)",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / baseline, 2),
        "detail": {
            "corpus_mb": round(nbytes / 1e6, 2),
            "tokens": int(total),
            "seconds": round(elapsed, 3),
            "baseline_mbps": round(baseline, 1),
            "baseline": "JTokkit cl100k_base 1-thread, Ryzen 9 5900X "
            "(reference benchmark/reports/jtokkit.txt)",
        },
    }
