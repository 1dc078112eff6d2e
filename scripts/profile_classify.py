"""Bisect classify/piece_starts costs op by op (scalar-out timing)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from jtokkit_tpu.engine.device import DeviceEngine
    from jtokkit_tpu.engine.oracle import OracleEngine
    from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
    from jtokkit_tpu.vocab.loader import load_builtin_ranks
    from jtokkit_tpu.utils.corpus import generate
    from jtokkit_tpu.ops import classify

    d = BUILTIN_DEFINITIONS["cl100k_base"]
    orc = OracleEngine(d.name, d.pattern, load_builtin_ranks(d.vocab_name), d.special_tokens)
    eng = DeviceEngine.from_oracle(orc)
    ct = eng._class_table

    docs = generate(2, seed=0, flavor="english")
    plan = list(eng._plan_chunks(docs))
    buf_np, valid_np, doc_ends_np, _ = plan[0]
    N = len(buf_np)
    buf = jax.block_until_ready(jnp.asarray(buf_np))
    valid = jax.block_until_ready(jnp.asarray(valid_np))

    def t(name, fn):
        dt = timeit(fn)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)

    # baseline noop
    t("noop x+1 sum", jax.jit(lambda b: (b.astype(jnp.int32) + 1).sum()).__call__ if False else (lambda: jax.jit(lambda b: (b.astype(jnp.int32) + 1).sum())(buf)))

    # 1. decode_utf8 alone
    f1 = jax.jit(lambda b: sum(x.sum() for x in classify.decode_utf8(b) if x.dtype != jnp.bool_) + classify.decode_utf8(b)[1].sum())
    t("decode_utf8", lambda: f1(buf))

    # 2. the table take on real codepoints
    @jax.jit
    def f2(b):
        cp, is_start, char_len = classify.decode_utf8(b)
        cpc = jnp.clip(cp, 0, 0x10FFFF)
        return jnp.take(ct, cpc, mode="clip").astype(jnp.int32).sum()
    t("decode+take", lambda: f2(buf))

    # 2b. take on synthetic indices (no decode dependency)
    idx = jax.block_until_ready(jnp.asarray(
        np.random.default_rng(0).integers(0, 0x110000, N).astype(np.int32)))
    f2b = jax.jit(lambda i: jnp.take(ct, i, mode="clip").astype(jnp.int32).sum())
    t("take random idx (mode=clip)", lambda: f2b(idx))

    f2c = jax.jit(lambda i: jnp.take(ct, i).astype(jnp.int32).sum())
    t("take random idx (default mode=fill)", lambda: f2c(idx))

    f2d = jax.jit(lambda i: ct[i].astype(jnp.int32).sum())
    t("ct[idx] direct", lambda: f2d(idx))

    # 2e. 2D-shaped take
    idx2 = idx.reshape(-1, 128)
    f2e = jax.jit(lambda i: jnp.take(ct, i, mode="clip").astype(jnp.int32).sum())
    t("take 2D idx (mode=clip)", lambda: f2e(idx2))

    # 3. full classify
    f3 = jax.jit(lambda b, v: classify.classify_bytes(b, ct, v)["cls"].sum())
    t("classify full", lambda: f3(buf, valid))

    # 4. classify minus the take (replace with arithmetic class)
    @jax.jit
    def f4(b, v):
        cp, is_start, char_len = classify.decode_utf8(b)
        cls_start = jnp.where(cp < 128, 1, 2)  # fake class, no gather
        n = b.shape[0]
        idx_ = jnp.arange(n, dtype=jnp.int32)
        vv = v
        is_start2 = is_start & vv
        cls_start = jnp.where(vv, cls_start, 6)
        def shift_r(x, k, fill):
            return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])
        s1 = shift_r(is_start2, 1, False)
        s2 = shift_r(is_start2, 2, False)
        c1 = shift_r(cls_start, 1, 6)
        c2 = shift_r(cls_start, 2, 6)
        c3 = shift_r(cls_start, 3, 6)
        cls = jnp.where(is_start2, cls_start, jnp.where(s1, c1, jnp.where(s2, c2, c3)))
        return cls.sum()
    t("classify minus gather", lambda: f4(buf, valid))


if __name__ == "__main__":
    main()
