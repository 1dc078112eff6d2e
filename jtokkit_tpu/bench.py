"""Throughput benchmark, mirroring the reference's protocol.

The reference preloads a 265 MB Gutenberg corpus into RAM and measures
full-corpus encode passes (reference ``benchmark/README.md:9-11``,
``benchmark/.../AbstractBenchmark.java:26-38``). Here the corpus is a
deterministic synthetic Gutenberg-like corpus (the books are not shipped in
the reference repo either — its ``benchmark/data`` is empty), preloaded on
the host, and encode/count passes run through the chosen engine. Reported
throughput = corpus UTF-8 bytes / wall-clock seconds, steady-state (after
one warm-up pass that also triggers compilation).

Modes (all end-to-end on the host side of the API):
  device        honest encode: every document's token ids materialized in
                host RAM as int32 arrays (``encode_ordinary_batch_arrays``)
  device-lists  same plus Python list conversion (reference output shape)
  device-count  token counting only (no token materialization/fetch)
  host          pure-Python oracle
  native / native-mt   C++ host engine, single / all threads
  tiktoken      comparison point, built from local rank files

Baseline for comparison: JTokkit single-thread per-encoding scores
(reference ``benchmark/reports/jtokkit.txt:26-29``), e.g. cl100k_base
14.144 s for 265 MB ≈ 18.7 MB/s on a Ryzen 9 5900X.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

BASELINE_MBPS = {
    # 265 MB / single-thread JMH score (reference benchmark/reports/jtokkit.txt)
    "cl100k_base": 265.0 / 14.144,
    "r50k_base": 265.0 / 12.263,
    "p50k_base": 265.0 / 12.800,
    "p50k_edit": 265.0 / 13.404,
}

MODES = (
    "device", "device-lists", "device-count", "decode", "device-decode",
    "host", "native", "native-mt", "tiktoken", "sharded", "sharded-count",
)


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


def _best_of(passes: int, fn):
    best = float("inf")
    out = None
    for _ in range(passes):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


# process-lifetime caches: repeated run() calls (companion sweeps) reuse the
# oracle and the device engine. The DeviceEngine is keyed by (vocab asset,
# pattern) so p50k_edit shares p50k_base's compiled pipeline — they differ
# only in special tokens, which encode_ordinary ignores (reference
# M/EncodingFactory.java:92 shares the rank file the same way).
_ORACLES: dict = {}
_ENGINES: dict = {}


def _oracle(encoding: str):
    orc = _ORACLES.get(encoding)
    if orc is None:
        from .engine.oracle import OracleEngine
        from .vocab.definitions import BUILTIN_DEFINITIONS
        from .vocab.loader import load_builtin_ranks

        d = BUILTIN_DEFINITIONS[encoding]
        orc = OracleEngine(
            d.name, d.pattern, load_builtin_ranks(d.vocab_name),
            d.special_tokens,
        )
        _ORACLES[encoding] = orc
    return orc


def _device_engine(encoding: str):
    from .vocab.definitions import BUILTIN_DEFINITIONS
    from .vocab.loader import asset_path

    d = BUILTIN_DEFINITIONS[encoding]
    key = (asset_path(d.vocab_name), d.pattern)
    eng = _ENGINES.get(key)
    if eng is None:
        from .engine.device import DeviceEngine

        eng = DeviceEngine.from_oracle(_oracle(encoding))
        _ENGINES[key] = eng
    return eng


def run(
    mb: float = 16,
    encoding: str = "cl100k_base",
    mode: str = "device",
    corpus: Optional[str] = None,
    flavor: str = "english",
    passes: int = 3,
    verify: bool = True,
    threads: Optional[int] = None,
    profile_dir: Optional[str] = None,
) -> dict:
    orc = _oracle(encoding)
    from .vocab.definitions import BUILTIN_DEFINITIONS

    d = BUILTIN_DEFINITIONS[encoding]

    docs = _load_corpus(mb, corpus, flavor)
    nbytes = sum(len(t.encode("utf-8")) for t in docs)
    detail = {}

    def _prof():
        """Profiler context around the MEASURED passes only (--profile)."""
        if profile_dir is None:
            return contextlib.nullcontext()
        import jax as _j

        detail["profile_dir"] = profile_dir
        return _j.profiler.trace(profile_dir)

    if mode == "host":
        elapsed, _ = _best_of(
            1, lambda: [orc.encode_ordinary(t)[0] for t in docs]
        )
        total = sum(len(orc.encode_ordinary(t)[0]) for t in docs)
    elif mode in ("native", "native-mt"):
        # reference protocol analog: single- and multi-threaded host passes
        # (the JMH benches fan files over a thread pool, reference
        # benchmark/.../AbstractMultiThreadedBenchmark.java:35-45; the C ABI
        # releases the GIL so Python threads scale)
        from .native import NativeEngine
        from .vocab.loader import asset_path
        from .vocab.tables import load_packed

        packed = load_packed(
            d.vocab_name, orc.ranks, asset_path(d.vocab_name)
        )
        nat = NativeEngine(packed, d.pattern)
        nat.encode_ordinary(docs[0])  # warm
        if mode == "native":
            with _prof():
                elapsed, out = _best_of(
                    passes,
                    lambda: [nat.encode_ordinary_array(t) for t in docs],
                )
            total = sum(len(t) for t in out)
        else:
            import concurrent.futures as cf
            import os as _os

            workers = threads or _os.cpu_count() or 2
            with cf.ThreadPoolExecutor(workers) as pool:
                with _prof():
                    elapsed, out = _best_of(passes, lambda: list(
                        pool.map(nat.encode_ordinary_array, docs)
                    ))
            total = sum(len(t) for t in out)
            detail["threads"] = workers
    elif mode == "tiktoken":
        # comparison point (reference benchmark/bench.py drives tiktoken's
        # encode_ordinary_batch); constructed from local rank files
        import tiktoken

        pat = {
            "gpt2": r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
            "cl100k": r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+""",
        }[d.pattern]
        tk = tiktoken.Encoding(
            name=encoding, pat_str=pat, mergeable_ranks=orc.ranks,
            special_tokens=d.special_tokens,
        )
        elapsed, out = _best_of(
            passes, lambda: tk.encode_ordinary_batch(docs)
        )
        total = sum(len(t) for t in out)
    elif mode in ("sharded", "sharded-count"):
        # data-parallel path over ALL visible devices (1-chip TPU: a 1-wide
        # mesh — sanity point; virtual CPU meshes exercise real scaling).
        # Mirrors the reference's multi-thread JMH fan-out
        # (benchmark/.../AbstractMultiThreadedBenchmark.java:35-45).
        import jax as _jax

        from .parallel.mesh import data_mesh
        from .parallel.sharded import ShardedTokenizer

        eng = _device_engine(encoding)
        tok = ShardedTokenizer(eng, data_mesh())
        plan = tok.preload_corpus(docs)
        total = tok.count_tokens_corpus(None, plan=plan)  # warm + compile
        if mode == "sharded-count":
            with _prof():
                elapsed, got = _best_of(
                    passes, lambda: tok.count_tokens_corpus(None, plan=plan)
                )
            assert got == total
        else:
            tok.encode_ordinary_batch_arrays(None, plan=plan)  # warm
            with _prof():
                elapsed, out = _best_of(
                    passes,
                    lambda: tok.encode_ordinary_batch_arrays(None, plan=plan),
                )
            assert sum(len(a) for a in out) == total
        detail["n_devices"] = tok.n_dev
        detail["backend"] = _jax.default_backend()
        if verify:
            import random

            rng = random.Random(0)
            sample = rng.sample(range(len(docs)), min(3, len(docs)))
            enc_out = tok.encode_ordinary_batch([docs[i] for i in sample])
            for k, i in enumerate(sample):
                assert enc_out[k] == orc.encode_ordinary(docs[i])[0], (
                    f"sharded parity failure on doc {i}"
                )
    else:
        eng = _device_engine(encoding)
        # corpus preloaded to HBM, mirroring the reference protocol's
        # RAM-preloaded corpus (reference benchmark/README.md:9-11); the
        # steady-state passes measure the encode pipeline, not the upload
        plan = eng.preload_corpus(docs)
        total = eng.count_tokens_corpus(docs, plan=plan)  # warm-up + compile
        if mode == "device-count":
            with _prof():
                elapsed, got = _best_of(
                    passes, lambda: eng.count_tokens_corpus(docs, plan=plan)
                )
            assert got == total
        elif mode in ("decode", "device-decode"):
            # decode throughput over the corpus's own tokens; value is
            # decoded UTF-8 bytes per second (same denominator as encode).
            # "decode" = the engine default (vectorized host gather);
            # "device-decode" = the on-device formulation.
            token_lists = eng.encode_ordinary_batch_arrays(None, plan=plan)
            dec = (eng.decode_bytes_batch_device if mode == "device-decode"
                   else eng.decode_bytes_batch)
            dec(token_lists)  # warm
            with _prof():
                elapsed, out = _best_of(passes, lambda: dec(token_lists))
            assert sum(len(b) for b in out) == nbytes
        else:
            eng.encode_ordinary_batch_arrays(None, plan=plan)  # warm
            if mode == "device-lists":
                with _prof():
                    elapsed, out = _best_of(passes, lambda: [
                        a.tolist()
                        for a in eng.encode_ordinary_batch_arrays(
                            None, plan=plan)
                    ])
                assert sum(len(t) for t in out) == total
            else:  # device: honest encode, int32 array per document
                with _prof():
                    elapsed, out = _best_of(
                        passes,
                        lambda: eng.encode_ordinary_batch_arrays(
                            None, plan=plan),
                    )
                assert sum(len(a) for a in out) == total
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
    where = "host" if mode in ("host", "native", "native-mt", "tiktoken") \
        else "1 chip"
    if mode in ("sharded", "sharded-count"):
        where = f"{detail['n_devices']}-dev mesh"
    detail.update({
        "corpus_mb": round(nbytes / 1e6, 2),
        "flavor": flavor,
        "tokens": int(total),
        "seconds": round(elapsed, 3),
        "baseline_mbps": round(baseline, 1),
        "baseline": f"JTokkit {encoding} 1-thread, Ryzen 9 5900X "
        "(reference benchmark/reports/jtokkit.txt)",
    })
    return {
        "metric": f"{encoding} encode throughput ({mode}, {where})",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / baseline, 2),
        "detail": detail,
    }


def run_scaling(
    mb_per_dev: float = 4.0,
    encoding: str = "cl100k_base",
    flavor: str = "english",
    passes: int = 3,
    sizes=None,
) -> list:
    """Weak-scaling sweep over data-parallel mesh sizes.

    Reference analog: the 1..64-thread JMH scaling table
    (``benchmark/reports/jtokkit.txt:1-29``). Each mesh size n gets a corpus
    of ``n * mb_per_dev`` MB (weak scaling: per-device work constant);
    throughput is steady-state ``count_tokens_corpus`` (pure device compute
    + the psum collective, no token fetch). Efficiency(n) =
    mbps(n) / (n * mbps(1)) — the ≥90% north-star metric (BASELINE.md).
    """
    import jax as _jax

    from .parallel.mesh import data_mesh
    from .parallel.sharded import ShardedTokenizer
    from .utils.corpus import generate

    eng = _device_engine(encoding)
    n_all = len(_jax.devices())
    if sizes is None:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_all]
    rows = []
    base_mbps = None
    for n in sizes:
        tok = ShardedTokenizer(eng, data_mesh(_jax.devices()[:n]))
        docs = generate(mb_per_dev * n, seed=0, flavor=flavor)
        nbytes = sum(len(t.encode("utf-8")) for t in docs)
        plan = tok.preload_corpus(docs)
        total = tok.count_tokens_corpus(None, plan=plan)  # warm + compile
        elapsed, got = _best_of(
            passes, lambda: tok.count_tokens_corpus(None, plan=plan)
        )
        assert got == total
        mbps = nbytes / elapsed / 1e6
        if base_mbps is None:
            base_mbps = mbps
        rows.append({
            "metric": f"{encoding} sharded count weak-scaling",
            "value": round(mbps, 2),
            "unit": "MB/s",
            "vs_baseline": round(
                mbps / BASELINE_MBPS.get(encoding,
                                         BASELINE_MBPS["cl100k_base"]), 2
            ),
            "detail": {
                "n_devices": n,
                "backend": _jax.default_backend(),
                "corpus_mb": round(nbytes / 1e6, 2),
                "flavor": flavor,
                "tokens": int(total),
                "seconds": round(elapsed, 3),
                "efficiency": round(mbps / (n * base_mbps), 3),
            },
        })
    return rows
