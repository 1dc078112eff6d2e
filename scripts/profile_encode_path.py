"""Round-3: where does honest encode time go?

Breaks encode_ordinary_batch into: device compute (count-mode proxy),
token materialization (scatters), D2H fetch, host stitch (split+tolist).
Usage: python scripts/profile_encode_path.py [mb] [flavor]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(mb=8.0, flavor="english"):
    import jax
    import jax.numpy as jnp

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
    print(f"{flavor}: {nbytes/1e6:.2f} MB, {len(docs)} docs, "
          f"{len(plan)} chunks")

    # 1. count-mode (device compute without token materialization)
    total = eng.count_tokens_corpus(docs, plan=plan)
    t0 = time.time(); eng.count_tokens_corpus(docs, plan=plan)
    t_count = time.time() - t0
    print(f"count-mode: {t_count:.3f}s  {nbytes/t_count/1e6:8.2f} MB/s "
          f"({total} tokens)")

    # 2. full pipeline with want_tokens=True, but only a scalar sync
    #    (device compute incl. scatters; no token fetch)
    results = eng._process_chunks(None, want_tokens=True, plan=plan)  # warm
    t0 = time.time()
    results = eng._process_chunks(None, want_tokens=True, plan=plan)
    s = 0
    for r in results:
        if r[0] == "ok":
            s += int(np.asarray(r[3]))
    t_mat = time.time() - t0
    print(f"materialize+1scalar: {t_mat:.3f}s  {nbytes/t_mat/1e6:8.2f} MB/s")

    # 3. + sequential D2H fetch of every chunk's token prefix
    t0 = time.time()
    results = eng._process_chunks(None, want_tokens=True, plan=plan)
    ok = [r for r in results if r[0] == "ok"]
    small = np.asarray(jnp.concatenate(
        [jnp.concatenate([r[3][None], r[4]]) for r in ok]))
    pos = 0
    fetched = []
    for r in ok:
        d_size = int(r[4].shape[0])
        n_tokens = int(small[pos]); pos += 1 + d_size
        fetched.append(np.asarray(r[2][:n_tokens]))
    t_fetch = time.time() - t0
    tok_mb = sum(f.nbytes for f in fetched) / 1e6
    print(f"+fetch ({tok_mb:.1f} MB tokens): {t_fetch:.3f}s  "
          f"{nbytes/t_fetch/1e6:8.2f} MB/s")

    # 4. full honest encode (includes host stitch into per-doc lists)
    out = eng.encode_ordinary_batch(docs)
    t0 = time.time()
    out = eng.encode_ordinary_batch(docs)
    t_enc = time.time() - t0
    print(f"encode_batch (lists): {t_enc:.3f}s  {nbytes/t_enc/1e6:8.2f} MB/s")
    assert sum(len(o) for o in out) == total


if __name__ == "__main__":
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    flavor = sys.argv[2] if len(sys.argv) > 2 else "english"
    main(mb, flavor)
